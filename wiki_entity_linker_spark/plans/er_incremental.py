"""Incremental entity resolution: absorb a new batch of files into an
already-clustered corpus in O(batch + touched) work.

The reference rebuilds its databases from scratch per Wikipedia dump
(Makefile:178-198 — every `make generate_databases` re-reads the whole dump);
at the graft's 10^12-file scale a daily append cannot re-read 100 TB. This
plan completes the StageManager story: :func:`run_er_pipeline`'s checkpointed
stage tables (``exact_groups``, ``features``, ``raw_blocks``, ``components``,
``assignment``) double as the incremental index, and each append writes a new
workdir carrying the SAME canonical tables, so appends chain indefinitely
(base → batch₁ → batch₂ → …) — the Iceberg-append pattern expressed through
the swappable stage store.

Work per append:

1. ingest the batch (drop files already clustered — idempotent re-delivery);
2. exact-dup split: a batch file whose ``content_hash`` already exists joins
   its old representative's cluster immediately — no features, no blocking,
   no scoring (the common case for vendored/boilerplate files);
3. features + raw block keys for genuinely-new representatives only
   (one content pass over the batch);
4. candidate pairs: batch block keys probe the base ``raw_blocks`` table
   (semi-joined down to the batch's keys — the base side is never scanned
   beyond one metadata-scale aggregation), plus batch-internal pairs via the
   same cap-and-salt used by the full run. The stopword cap applies to
   COMBINED (old + new) block sizes, matching what a full recompute sees;
5. scoring: the base ``features`` stage table is semi-joined to touched ids,
   so old content is never re-read;
6. merge: old edge endpoints are contracted to their transitively-closed
   component labels and a batch-sized mini graph is solved
   (operators/closure.merge_components) — untouched clusters keep their ids
   verbatim, touched clusters relabel to min member id exactly as a full
   recompute would.

Store note: the COMPUTE is O(batch + touched), and with the
:class:`~wiki_entity_linker_spark.plans.checkpoint.IcebergStore` the merged
canonical tables are appends/MERGE INTO (row-level, snapshot-isolated); the
default :class:`ParquetStore` has no append semantics, so it re-writes the
merged tables in full — correct, but O(corpus) I/O. At 100 TB run appends
against the Iceberg store.

Fidelity note: inside blocks larger than ``cfg.salt_cap`` the full run salts
into chained sub-blocks (operators/skew.py), scoring only chunk-local pairs
and relying on transitive closure; the incremental probe scores a new member
against ALL old members of the block. The incremental candidate set is
therefore a connectivity SUPERSET of the full run's inside salted blocks —
clusters are never less complete, and are identical whenever blocks stay
under the cap (pinned by tests/test_incremental.py against a 90/10 replay).
"""

from __future__ import annotations

import os
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wiki_entity_linker_spark.eval.pairwise import evaluate_against_labeled_pairs
from wiki_entity_linker_spark.operators.blocking import pairs_from_blocks, with_file_id
from wiki_entity_linker_spark.operators.closure import merge_components
from wiki_entity_linker_spark.operators.skew import (
    cap_and_salt_blocks,
    spread_small_input,
)
from wiki_entity_linker_spark.plans.checkpoint import ParquetStore, StageManager
from wiki_entity_linker_spark.plans.er_pipeline import (
    ERConfig,
    _input_fingerprint,
    build_features,
    ingest_projection,
    match_edges,
    raw_block_keys,
    score_pairs,
)

#: canonical stage tables an incremental run reads from its base workdir and
#: re-writes (merged) into its own workdir, so appends chain
CANONICAL_STAGES = ("exact_groups", "features", "raw_blocks", "components", "assignment")


def run_er_incremental(
    spark: SparkSession,
    base_workdir: str,
    new_files: DataFrame,
    workdir: str,
    cfg: ERConfig | None = None,
    labeled_pairs: DataFrame | None = None,
    alias_dict: DataFrame | None = None,
    store=None,
    base_store=None,
) -> dict[str, DataFrame]:
    """Append ``new_files`` to the clustering checkpointed at
    ``base_workdir``; write the merged canonical stage tables to ``workdir``.

    ``workdir`` must differ from ``base_workdir``: the base tables feed the
    merged ones lazily, and overwriting an input mid-plan corrupts it.
    """
    cfg = cfg or ERConfig()
    if os.path.abspath(workdir) == os.path.abspath(base_workdir):
        raise ValueError(
            "run_er_incremental: workdir must differ from base_workdir "
            "(merged stage tables are built FROM the base tables; writing "
            "over a lazily-read parquet input corrupts it)"
        )
    bs = base_store or ParquetStore(base_workdir)
    try:
        old_exact = bs.read(spark, "exact_groups")
        old_feats = bs.read(spark, "features")
        old_raw_blocks = bs.read(spark, "raw_blocks")
        old_comps = bs.read(spark, "components")
        old_assign = bs.read(spark, "assignment")
    except Exception as exc:  # noqa: BLE001 — surface a actionable message
        raise ValueError(
            f"base workdir {base_workdir!r} lacks the checkpointed stage "
            "tables an incremental append needs (run run_er_pipeline with "
            f"checkpoint=True first): {exc}"
        ) from exc

    mgr = StageManager(
        spark,
        workdir,
        asdict(cfg)
        | {
            "base": os.path.abspath(base_workdir),
            "input": _input_fingerprint(new_files),
            "alias_dict": None if alias_dict is None else _input_fingerprint(alias_dict),
        },
        enabled=True,
        store=store,
    )
    n_part = spark.sparkContext.defaultParallelism
    raw = with_file_id(
        spread_small_input(new_files, min_factor=1.0, target_factor=2)
    )

    # 1. batch ingest; idempotent on re-delivered files (anti-join on the
    # base assignment — file_id is sha256(repo|path|commit), so the same
    # logical file always re-derives the same id)
    def _ingest() -> DataFrame:
        return ingest_projection(raw).join(
            old_assign.select(F.col("id").alias("file_id")), "file_id", "left_anti"
        )

    new_ing = mgr.stage("batch_ingest", _ingest)

    # 2. exact-dup split: hash hits inherit the OLD representative
    # (first-writer-wins — the rep and its path-derived blocking keys never
    # change retroactively, which is what keeps cluster ids append-stable)
    def _groups() -> DataFrame:
        batch = new_ing.groupBy("content_hash").agg(
            F.min("file_id").alias("batch_rep"),
            F.count("*").alias("batch_size"),
        )
        old = old_exact.select("content_hash", "rep_id")
        hit = batch.join(old, "content_hash", "inner").select(
            "content_hash", "rep_id", "batch_size", F.lit(False).alias("is_new")
        )
        new = batch.join(old, "content_hash", "left_anti").select(
            "content_hash",
            F.col("batch_rep").alias("rep_id"),
            "batch_size",
            F.lit(True).alias("is_new"),
        )
        return hit.unionByName(new)

    batch_groups = mgr.stage("batch_groups", _groups)

    # 3. features + raw block keys for genuinely-new reps only
    new_rep_ids = batch_groups.filter("is_new").select(
        F.col("rep_id").alias("file_id")
    )
    new_rep_rows = (
        raw.select("file_id", "path", "lang", "content")
        .join(new_rep_ids, "file_id", "left_semi")
        .repartition(n_part, "file_id")
    )
    new_feats = mgr.stage(
        "batch_features", lambda: build_features(new_rep_rows, cfg)
    ).persist()
    new_raw_blocks = mgr.stage(
        "batch_raw_blocks",
        lambda: raw_block_keys(new_feats, cfg, reps=new_rep_rows, alias_dict=alias_dict),
    )

    # 4. candidate pairs: probe base blocks with batch keys + batch-internal
    # pairs. The base table contributes one semi-join (pushdown-friendly on a
    # bucketed/Iceberg block index) and one size aggregation over the probed
    # keys only.
    def _pairs() -> DataFrame:
        new_keys = new_raw_blocks.select("block_key").dropDuplicates(["block_key"])
        old_probe = old_raw_blocks.join(F.broadcast(new_keys), "block_key", "left_semi")
        o_sizes = old_probe.groupBy("block_key").agg(F.count("*").alias("__on"))
        n_sizes = new_raw_blocks.groupBy("block_key").agg(F.count("*").alias("__nn"))
        # stopword rule on COMBINED sizes — what a full recompute would see
        hot = (
            n_sizes.join(o_sizes, "block_key", "left")
            .filter(
                F.col("__nn") + F.coalesce(F.col("__on"), F.lit(0))
                > cfg.stopword_block_max
            )
            .select("block_key")
        )
        probe_new = new_raw_blocks.join(F.broadcast(hot), "block_key", "left_anti")
        probe_old = old_probe.join(F.broadcast(hot), "block_key", "left_anti")
        cross = (
            probe_new.select("block_key", F.col("file_id").alias("__n"))
            .join(probe_old.select("block_key", F.col("file_id").alias("__b")), "block_key")
            .select(
                F.least("__n", "__b").alias("id_a"),
                F.greatest("__n", "__b").alias("id_b"),
            )
            .filter(F.col("id_a") != F.col("id_b"))
        )
        intra = pairs_from_blocks(
            cap_and_salt_blocks(
                new_raw_blocks, max_size=cfg.stopword_block_max, cap=cfg.salt_cap
            )
        )
        return cross.unionByName(intra).dropDuplicates(["id_a", "id_b"])

    pairs = mgr.stage("batch_pairs", _pairs)

    # 5. scoring: base features semi-joined to touched ids — old content is
    # never re-read, old features only for block-sharing reps
    def _scores() -> DataFrame:
        touched = (
            pairs.select(F.col("id_a").alias("file_id"))
            .unionByName(pairs.select(F.col("id_b").alias("file_id")))
            .dropDuplicates(["file_id"])
        )
        feats_all = old_feats.join(touched, "file_id", "left_semi").unionByName(
            new_feats
        )
        return score_pairs(pairs, feats_all)

    scores = mgr.stage("batch_scores", _scores)
    edges = mgr.stage("batch_edges", lambda: match_edges(scores, cfg))

    # 6. merge into the existing labeling (batch-sized mini graph)
    comps = mgr.stage(
        "components",
        lambda: merge_components(
            old_comps,
            edges,
            new_rep_ids.select(F.col("file_id").alias("id")),
            id_col="id",
            comp_col="component",
            max_iter=cfg.max_cc_iter,
            local_solve_threshold=cfg.cc_local_solve_threshold,
        ),
    )

    # 7. full assignment: every base file (relabeled where its cluster was
    # touched) + every batch file (hash hits via their old rep, new files via
    # their batch rep). comps covers old reps ∪ new reps by construction.
    # The base side is relabeled through a BATCH-SIZED broadcast map (an old
    # label x is its own component in old_comps, so x is touched iff
    # comps[x] != x) — one map-side pass over the old assignment, no shuffle.
    def _assign() -> DataFrame:
        old_label_rows = old_comps.filter(
            F.col("id") == F.col("component")
        ).select("id")
        changed = (
            comps.join(old_label_rows, "id", "left_semi")
            .filter(F.col("component") != F.col("id"))
            .select(F.col("id").alias("__old_c"), F.col("component").alias("__new_c"))
        )
        relabeled_old = old_assign.join(
            F.broadcast(changed), F.col("component") == F.col("__old_c"), "left"
        ).select("id", F.coalesce("__new_c", F.col("component")).alias("component"))
        rep_comp = comps.join(
            batch_groups.select(F.col("rep_id").alias("id")), "id", "left_semi"
        ).select(F.col("id").alias("rep_id"), "component")
        batch_members = (
            new_ing.select("file_id", "content_hash")
            .join(batch_groups.select("content_hash", "rep_id"), "content_hash")
            .join(rep_comp, "rep_id")
            .select(F.col("file_id").alias("id"), "component")
        )
        return relabeled_old.unionByName(batch_members)

    assignment = mgr.stage("assignment", _assign)

    # 8. merged canonical tables so the NEXT append can use this workdir as
    # its base (exact_groups: sizes folded, reps unchanged; features/raw
    # blocks: simple appends)
    def _merged_exact() -> DataFrame:
        hits = batch_groups.filter(~F.col("is_new")).select(
            "content_hash", F.col("batch_size").alias("__add")
        )
        grown = (
            old_exact.join(hits, "content_hash", "left")
            .select(
                "content_hash",
                "rep_id",
                (F.col("group_size") + F.coalesce("__add", F.lit(0))).alias(
                    "group_size"
                ),
            )
        )
        fresh = batch_groups.filter("is_new").select(
            "content_hash", "rep_id", F.col("batch_size").alias("group_size")
        )
        return grown.unionByName(fresh)

    merged_exact = mgr.stage("exact_groups", _merged_exact)
    mgr.stage("features", lambda: old_feats.unionByName(new_feats))
    mgr.stage("raw_blocks", lambda: old_raw_blocks.unionByName(new_raw_blocks))

    out: dict[str, DataFrame] = {
        "ingested": new_ing,
        "batch_groups": batch_groups,
        "exact_groups": merged_exact,
        "features": new_feats,
        "raw_blocks": new_raw_blocks,
        "pairs": pairs,
        "scores": scores,
        "edges": edges,
        "components": comps,
        "assignment": assignment,
    }
    if labeled_pairs is not None:
        out["metrics"] = mgr.stage(
            "metrics",
            lambda: evaluate_against_labeled_pairs(
                assignment, labeled_pairs, id_col="id", cluster_col="component"
            ),
            collect_lineage=False,
        )
    out["_counters"] = mgr.counters  # type: ignore[assignment]
    out["_cleanup"] = lambda: new_feats.unpersist()  # type: ignore[assignment]
    return out
