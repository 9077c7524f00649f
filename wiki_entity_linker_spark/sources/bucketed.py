"""Bucketed stage tables: shuffle-free co-located joins.

At 100 TB the candidate-pair stages join the same key (``file_id`` /
``content_hash``) over and over; writing the hot tables bucketed by that key
once lets every later join read co-partitioned data and skip its exchange
entirely (Spark native bucketing — the parquet/catalog analogue of the
Iceberg bucket-partition transform the checkpoint store would use).

``write_bucketed`` + a join between two tables bucketed on the same key and
count produces a SortMergeJoin with NO Exchange on either side
(tests/test_plans.py asserts exactly that on the physical plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    ``n_buckets`` should be sized so each bucket file lands near the scan
    granularity (256 MB at the 100 TB conf profile); both join sides must
    use the SAME key and bucket count for the exchange to be elided.
    Bucket-sorting additionally removes the per-task Sort under SMJ.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
