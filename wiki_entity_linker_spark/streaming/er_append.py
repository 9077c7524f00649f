"""Streaming entity-resolution appends.

Completes the incremental-append story (plans/er_incremental.py) as a
Structured Streaming sink: micro-batches of newly-arrived source files are
absorbed into the checkpointed clustering via ``foreachBatch`` →
:func:`run_er_incremental`, each batch chaining a new workdir off the
previous one. This is the production shape of the reference's "new dump
arrived, rebuild everything" Makefile loop (Makefile:178-198), inverted:
arrivals are clustered continuously, and a full rebuild becomes an optional
compaction instead of the only mechanism.

Durability/exactly-once: the chain head lives in ``chain_root/head.json``
and is advanced only AFTER an append's stage tables are fully written, so a
restarted query resumes appending to the latest complete clustering. A
micro-batch replayed by the stream checkpoint (failure between absorb and
commit) is harmless by construction: file identity is content-addressed
(``file_id = sha256(repo|path|commit)``), so the append's ingest anti-join
drops every already-clustered row and the replay degenerates to the fixed
per-append floor — idempotence comes from the data model, not from sink
bookkeeping.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

#: schema of source-file drops (FIXTURES.md §1 / BASELINE.json input_hint)
SOURCE_SCHEMA = "repo string, path string, commit string, lang string, content string"


def _head_path(chain_root: str) -> str:
    return os.path.join(chain_root, "head.json")


def _head_state(chain_root: str) -> dict:
    p = _head_path(chain_root)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def chain_head(chain_root: str, default: str | None = None) -> str | None:
    """The workdir holding the latest complete clustering of the chain."""
    return _head_state(chain_root).get("head", default)


def chain_depth(chain_root: str) -> int:
    """Number of un-compacted append levels above the nearest self-contained
    workdir (0 right after a full run or a compaction)."""
    return _head_state(chain_root).get("depth", 0)


def streaming_er_append(
    spark: SparkSession,
    source_dir: str,
    base_workdir: str,
    chain_root: str,
    checkpoint_dir: str,
    cfg=None,
    compact_every: int | None = 8,
    materialize_assignment: bool = True,
) -> StreamingQuery:
    """Stream parquet drops of new source files into the clustering rooted
    at ``base_workdir``; per-epoch workdirs chain under ``chain_root``.

    ``trigger(availableNow=True)``: drain everything currently visible and
    stop — the batch-job-shaped streaming trigger, so appends can run from
    cron/Airflow with streaming-checkpoint semantics. Re-invoke after new
    drops; the stream checkpoint skips files already processed and
    :func:`chain_head` always points at the newest complete clustering.

    Auto-compaction: ``read_canonical`` through a chain costs one union per
    un-compacted append, so an unattended long-running stream would degrade
    reads to O(epochs). Whenever the chain depth reaches ``compact_every``,
    the epoch's append is followed by a :func:`compact_chain` into
    ``<epoch workdir>_compact`` and the head advances to the compacted,
    self-contained workdir (depth resets to 0) — the LSM minor-compaction
    policy, run inline because the next append must base on its output.
    ``compact_every=None`` disables the policy (compact by hand). A crash
    between the append's head commit and the compaction is safe: the head
    already points at the complete appended clustering, and the next epoch
    simply triggers the compaction again at the same depth.

    ``materialize_assignment=False`` delta-chains components/assignment too
    (O(batch) write per epoch; see run_er_incremental) — pair it with
    ``compact_every`` so the periodic compaction re-materializes the
    whole-corpus tables and bounds the resolve-join depth.
    """
    from wiki_entity_linker_spark.plans.er_incremental import (
        compact_chain,
        run_er_incremental,
    )

    os.makedirs(chain_root, exist_ok=True)
    stream = spark.readStream.schema(SOURCE_SCHEMA).parquet(source_dir)

    def _advance(head: str, epoch_id: int, depth: int) -> None:
        with open(_head_path(chain_root), "w") as f:
            json.dump({"head": head, "epoch": epoch_id, "depth": depth}, f)

    def _absorb(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        base = chain_head(chain_root, base_workdir)
        wd = os.path.join(chain_root, f"epoch_{epoch_id}")
        if base == wd:
            # exact replay of an epoch whose head update already committed
            return
        out = run_er_incremental(
            batch_df.sparkSession, base, batch_df, wd, cfg=cfg,
            materialize_assignment=materialize_assignment,
        )
        out["_cleanup"]()
        depth = chain_depth(chain_root) + 1
        # advance the head only after every stage table is on disk
        _advance(wd, epoch_id, depth)
        if compact_every is not None and depth >= compact_every:
            cwd = wd + "_compact"
            compact_chain(batch_df.sparkSession, wd, cwd)
            _advance(cwd, epoch_id, 0)

    return (
        stream.writeStream.foreachBatch(_absorb)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
