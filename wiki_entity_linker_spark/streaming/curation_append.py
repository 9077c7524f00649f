"""Streaming curation appends.

Completes the incremental-curation story (plans/curation_incremental.py) as
a Structured Streaming sink, mirroring streaming/er_append.py: micro-batches
of newly-crawled documents are absorbed into the checkpointed curation state
via ``foreachBatch`` → :func:`run_curation_increment`, each batch chaining a
new workdir off the previous one; the chain head lives in
``chain_root/head.json`` and advances only AFTER an append's stage tables
are fully written.

Replay safety: the curation append is STRICT about id-monotonic batches
(run_curation_increment raises on re-seen ids), so the absorb pre-filters a
replayed micro-batch against the head's verdict table (doc_id anti-join)
and skips it when nothing new remains — the stream checkpoint plus that
filter make replays harmless without weakening the plan-level guard.

Auto-compaction: reads through a chain cost one union per un-compacted
level, so when the chain depth reaches ``compact_every`` the epoch's append
is followed by :func:`compact_curation_chain` (which, unlike the ER
compaction, never re-reads a document — curation state is fully determined
by the index + narrow tables) and the head advances to the self-contained
workdir.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

#: schema of document drops (documents-table shape, TESTDATA.md)
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _head_path(chain_root: str) -> str:
    return os.path.join(chain_root, "head.json")


def _head_state(chain_root: str) -> dict:
    p = _head_path(chain_root)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def chain_head(chain_root: str, default: str | None = None) -> str | None:
    return _head_state(chain_root).get("head", default)


def chain_depth(chain_root: str) -> int:
    return _head_state(chain_root).get("depth", 0)


def streaming_curation_append(
    spark: SparkSession,
    source_dir: str,
    base_workdir: str,
    chain_root: str,
    checkpoint_dir: str,
    cfg=None,
    benchmark: DataFrame | None = None,
    compact_every: int | None = 8,
) -> StreamingQuery:
    """Stream parquet drops of new documents into the curated corpus rooted
    at ``base_workdir``; per-epoch workdirs chain under ``chain_root``.
    ``trigger(availableNow=True)`` drains what is visible and stops (the
    cron/Airflow-shaped streaming trigger); re-invoke after new drops."""
    from wiki_entity_linker_spark.plans.checkpoint import ParquetStore
    from wiki_entity_linker_spark.plans.curation_incremental import (
        compact_curation_chain,
        run_curation_increment,
    )

    os.makedirs(chain_root, exist_ok=True)
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(source_dir)

    def _advance(head: str, epoch_id: int, depth: int) -> None:
        with open(_head_path(chain_root), "w") as f:
            json.dump({"head": head, "epoch": epoch_id, "depth": depth}, f)

    def _absorb(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        base = chain_head(chain_root, base_workdir)
        wd = os.path.join(chain_root, f"epoch_{epoch_id}")
        if base == wd:
            return  # exact replay of a fully-committed epoch
        # replay filter: drop already-curated ids so a re-delivered batch
        # degenerates to its genuinely-new suffix (or a clean skip)
        seen = ParquetStore(base).read(batch_df.sparkSession, "verdicts")
        fresh = batch_df.join(
            seen.select("doc_id"), "doc_id", "left_anti"
        ).localCheckpoint(eager=True)
        if not fresh.take(1):
            return
        run_curation_increment(
            batch_df.sparkSession, base, fresh, wd, cfg=cfg,
            benchmark=benchmark,
        )
        depth = chain_depth(chain_root) + 1
        _advance(wd, epoch_id, depth)
        if compact_every is not None and depth >= compact_every:
            cwd = wd + "_compact"
            compact_curation_chain(batch_df.sparkSession, wd, cwd)
            _advance(cwd, epoch_id, 0)

    return (
        stream.writeStream.foreachBatch(_absorb)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
