"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship near-dup clustering over the sf0.001
documents table; ``queries()`` / ``oracle_sql()`` expose the full operator
inventory from SURVEY.md §2 (implemented in
``wiki_entity_linker_spark/queries.py``) for the DuckDB cross-check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wiki_entity_linker_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: MinHash near-dup clustering
    of the documents table → per-cluster sizes (driver checks rows > 0)."""
    from pyspark.sql import functions as F

    assignment = _q.er_cluster_documents(spark, "/root/testdata/sf0.001")
    return (
        assignment.groupBy("component")
        .agg(F.count("*").alias("cluster_size"), F.min("id").alias("min_doc_id"))
        .orderBy("component")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
