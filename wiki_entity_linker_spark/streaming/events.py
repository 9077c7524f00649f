"""Structured Streaming operators.

The reference is batch-only (SURVEY.md §2.9) — its "incremental" story is
resumable Make targets. The rebuild adds genuine streaming equivalents for
the two shapes a continuously-ingesting corpus needs:

* :func:`windowed_event_counts` — watermarked sliding-window aggregation over
  the ``events`` table shape (late data handled by the watermark);
* :func:`incremental_block_stream` — streaming ingest of new source files →
  per-microbatch blocking keys via ``foreachBatch`` into a parquet/Iceberg
  stage table, i.e. the streaming front half of the ER pipeline (candidate
  generation is incremental; clustering remains a periodic batch job, which
  is the standard lambda split for transitive closure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked windowed counts/sums per event_type (works on both batch
    and streaming DataFrames with the same plan)."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    # watermarks require TIMESTAMP (ltz); parquet often yields TIMESTAMP_NTZ.
    # The session timezone is pinned UTC so the cast is value-preserving.
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win, "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def incremental_block_stream(
    spark: SparkSession,
    source_glob: str,
    out_dir: str,
    checkpoint_dir: str,
    k_shingle: int = 3,
    n_hashes: int = 16,
    bands: int = 8,
) -> StreamingQuery:
    """Stream new source-file parquet drops → append blocking keys.

    ``foreachBatch`` gives exactly-once appends to the stage table; each
    micro-batch runs the same JVM-side minhash/banding used by the batch
    pipeline (no separate streaming codepath to drift).
    """
    from wiki_entity_linker_spark.operators.blocking import (
        lsh_band_blocks,
        minhash_signatures,
        with_file_id,
    )

    schema = (
        "repo string, path string, commit string, lang string, content string"
    )
    stream = spark.readStream.schema(schema).parquet(source_glob)

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        sigs = minhash_signatures(
            with_file_id(batch_df), "file_id", "content", k_shingle, n_hashes
        )
        blocks = lsh_band_blocks(sigs, "file_id", bands, n_hashes)
        blocks.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(out_dir)

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
