"""Resumable training-data curation pipeline.

Composes the oracle-checked curation operators into ONE StageManager plan —
the chain a pretraining-data team actually runs over a crawl snapshot:

    verdicts (exact sha + ExactSubstr coverage + CCNet segment dedup)
      → contamination (benchmark n-gram overlap, broadcast probe)
      → kept corpus
      → mixture allocation (temperature-weighted per-source token budget)
      → token-budget sample (per-source hash-order walk against the
        ALLOCATED budget — the mixture stage decides how many tokens per
        source, this stage decides which documents)
      → stratified eval slice (per source × length-quartile stratum)

Every stage is a checkpointed stage table with lineage counters (the
er_pipeline.py discipline: re-running the same workdir resumes instantly,
changing any CurationConfig field or the input invalidates downstream).
Each component keeps its documented scale shape — nothing here adds a
shuffle beyond what the operators already do; the assembly is doc_id /
source equi-joins and broadcast summary frames.

Mirrors the reference's batch-pipeline structure (Makefile targets chaining
getlinks → frequencies → databases, wiki_entity_linker scripts/), recast as
resumable Spark stage tables over a documents corpus.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import json
import os

from wiki_entity_linker_spark.functions.hashing import h64
from wiki_entity_linker_spark.functions.text import (
    normalize_content,
    shingles,
    tokenize,
)
from wiki_entity_linker_spark.operators.dedup import (
    _cut,
    exact_substring_coverage,
    segment_dedup_stats,
)
from wiki_entity_linker_spark.plans.checkpoint import StageManager
from wiki_entity_linker_spark.plans.er_pipeline import _input_fingerprint


@dataclass
class CurationConfig:
    substr_k: int = 5           # ExactSubstr minimum-match gram length
    seg_len: int = 8            # CCNet-style segment length (tokens)
    boilerplate_frac: float = 0.25   # drop docs above this dup coverage
    decontam_k: int = 3         # benchmark-overlap n-gram length
    token_budget: int = 1_000_000    # total training-token budget
    temperature: float = 0.5    # mixture weight ∝ tokens^temperature (α<1)
    eval_per_stratum: int = 3   # eval docs per (source, length-quartile)
    extra: dict = field(default_factory=dict)


def exact_hash_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, content_hash) — sha256 of whitespace-normalized content, the
    exact-dup identity shared by the full run and the incremental append
    (its chained probe index)."""
    return docs.select(
        F.col(id_col),
        F.sha2(normalize_content(text_col), 256).alias("content_hash"),
    )


def verdict_expr(boilerplate_frac: float):
    """The verdict decision column over (doc_id, canonical_id,
    substr_dup_frac, seg_dup_frac) — shared by the full run and the
    incremental append so both label identically."""
    thr = float(boilerplate_frac)
    return (
        F.when(F.col("canonical_id") != F.col("doc_id"), "drop_exact_dup")
        .when(
            (F.col("substr_dup_frac") > thr) | (F.col("seg_dup_frac") > thr),
            "drop_boilerplate",
        )
        .otherwise("keep")
    )


def assemble_verdicts(
    ex: DataFrame, sub: DataFrame, seg: DataFrame, boilerplate_frac: float
) -> DataFrame:
    """Final verdict assembly from the three tier frames — shared by the
    full run and the incremental append so both label identically.
    ``ex``: (doc_id, canonical_id); ``sub``: (doc_id, n_tokens,
    substr_dup_frac); ``seg``: (doc_id, seg_dup) with seg_dup nullable."""
    j = (
        sub.join(ex, "doc_id")
        .join(seg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "canonical_id",
            "substr_dup_frac",
            F.round(
                F.coalesce("seg_dup", F.lit(0).cast("long"))
                / F.greatest("n_tokens", F.lit(1).cast("long")),
                6,
            ).alias("seg_dup_frac"),
        )
    )
    return j.select(
        "doc_id",
        "n_tokens",
        "canonical_id",
        "substr_dup_frac",
        "seg_dup_frac",
        verdict_expr(boilerplate_frac).alias("verdict"),
    )


def dedup_verdict_table(
    docs: DataFrame, cfg: CurationConfig, mgr=None
) -> DataFrame:
    """One verdict per document from the three exact-dedup tiers (the
    registered ``dedup_verdicts`` query, parameterized and mgr-threaded):
    'drop_exact_dup' for a later copy of an identical doc,
    'drop_boilerplate' above the duplicate-coverage threshold, else 'keep'.

    With a StageManager the per-doc hash table is cut as the
    ``exact_hashes`` stage — together with ``exact_substring_grams`` and
    ``segment_dedup_seg`` it forms the probe index the incremental append
    (plans/curation_incremental.py) resolves against.
    """
    hashed = _cut(exact_hash_table(docs), mgr, "exact_hashes")
    w = Window.partitionBy("content_hash")
    ex = hashed.select(
        "doc_id", F.min("doc_id").over(w).alias("canonical_id")
    )
    # one corpus tokenization shared by both token tiers (the sha tier
    # hashes normalized text, not tokens); same rule both consumers apply
    toks = _cut(
        docs.select("doc_id", tokenize("text").alias("t")), mgr, "verdict_toks"
    )
    sub = exact_substring_coverage(
        docs, k=cfg.substr_k, mgr=mgr, tokenized=toks
    ).select(
        "doc_id", "n_tokens", F.col("covered_frac").alias("substr_dup_frac")
    )
    seg = segment_dedup_stats(
        docs, seg_len=cfg.seg_len, mgr=mgr, tokenized=toks
    ).select(
        "doc_id", F.col("dup_tokens").alias("seg_dup")
    )
    return assemble_verdicts(ex, sub, seg, cfg.boilerplate_frac)


def contamination_flags(
    docs: DataFrame, benchmark: DataFrame, k: int
) -> DataFrame:
    """(doc_id, is_contaminated): does the document share any k-gram with
    the benchmark? Benchmark grams are the BROADCAST side (eval suites are
    tiny next to the corpus); corpus side is explode + broadcast semi-join
    + per-doc any() — no corpus-vs-corpus shuffle."""
    bench = (
        benchmark.select(F.explode(shingles(tokenize("text"), k)).alias("g"))
        .dropDuplicates(["g"])
        .withColumn("__hit", F.lit(1))
    )
    grams = docs.select(
        "doc_id", F.explode(shingles(tokenize("text"), k)).alias("g")
    )
    return (
        grams.join(F.broadcast(bench), "g", "left")
        .groupBy("doc_id")
        .agg((F.coalesce(F.sum("__hit"), F.lit(0)) > 0).alias("is_contaminated"))
    )


def mixture_table(kept: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Temperature-weighted per-source token allocation with exact
    largest-remainder rounding over the KEPT corpus (the registered
    ``mixture_allocation`` query, parameterized). All windows run over the
    #sources-row summary frame — metadata-scale by construction."""
    budget = int(cfg.token_budget)
    per = kept.groupBy("source").agg(F.sum("n_tokens").alias("n_tokens"))
    w_all = Window.partitionBy()
    wt = F.pow(F.col("n_tokens").cast("double"), float(cfg.temperature))
    t = per.withColumn("target", F.lit(budget) * wt / F.sum(wt).over(w_all))
    r = (
        t.withColumn("base", F.floor("target"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(
                    F.round(F.col("target") - F.floor("target"), 6).desc(),
                    F.col("source"),
                )
            ),
        )
        .withColumn(
            "leftover", F.lit(budget) - F.sum(F.floor("target")).over(w_all)
        )
    )
    alloc = F.col("base") + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
    return r.select(
        "source",
        "n_tokens",
        alloc.cast("long").alias("alloc_tokens"),
        F.round(alloc / F.col("n_tokens"), 6).alias("sampling_rate"),
    )


def budget_sample(kept: DataFrame, mixture: DataFrame) -> DataFrame:
    """Realize the mixture: walk each source's kept documents in
    reproducible portable-hash order and keep documents while the source's
    cumulative tokens stay within its ALLOCATED budget. One window
    partitioned BY SOURCE (never a global funnel); the allocation joins in
    broadcast (source-cardinality frame)."""
    w = (
        Window.partitionBy("source")
        .orderBy("key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = kept.withColumn("key", h64(F.col("doc_id").cast("string")))
    cum = F.sum("n_tokens").over(w).cast("long")
    return (
        d.join(F.broadcast(mixture.select("source", "alloc_tokens")), "source")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            cum.alias("cum_tokens"),
            (cum <= F.col("alloc_tokens")).alias("kept"),
        )
    )


def stratified_eval_slice(kept: DataFrame, per_stratum: int) -> DataFrame:
    """Stratified eval-set construction over the kept corpus:
    ``per_stratum`` docs per (source, length-quartile), picked in
    reproducible portable-hash order. Quartile thresholds come from the
    (source, length) histogram; the only corpus-wide window partitions by
    (source, stratum)."""
    hist = kept.groupBy("source", "n_tokens").agg(
        F.count("*").cast("long").alias("c")
    )
    ws = Window.partitionBy("source")
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(
            ws.orderBy("n_tokens").rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn("n_docs", F.sum("c").over(ws))

    def _p(q: float):
        return F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(q) * F.col("n_docs")),
                F.col("n_tokens"),
            )
        ).cast("long")

    thr = cum.groupBy("source").agg(
        _p(0.25).alias("q25"), _p(0.50).alias("q50"), _p(0.75).alias("q75")
    )
    s = kept.join(F.broadcast(thr), "source").select(
        "doc_id",
        "source",
        "n_tokens",
        F.when(F.col("n_tokens") <= F.col("q25"), 0)
        .when(F.col("n_tokens") <= F.col("q50"), 1)
        .when(F.col("n_tokens") <= F.col("q75"), 2)
        .otherwise(3)
        .cast("long")
        .alias("stratum"),
    )
    rk = F.row_number().over(
        Window.partitionBy("source", "stratum").orderBy(
            h64(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    return (
        s.withColumn("rk", rk.cast("long"))
        .filter(F.col("rk") <= per_stratum)
        .select("source", "stratum", "doc_id", "n_tokens", "rk")
    )


def run_curation_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    workdir: str,
    cfg: CurationConfig | None = None,
    benchmark: DataFrame | None = None,
    checkpoint: bool = True,
    store=None,
) -> dict[str, DataFrame]:
    """End-to-end curation over a ``(doc_id, source, text)`` corpus.

    Returns stage tables: ``verdicts``, ``contamination`` (when a benchmark
    is given), ``kept``, ``mixture``, ``sample``, ``eval_slice``,
    ``report`` (per-source accounting), plus ``_counters`` with per-stage
    lineage (rows_out, partitions, resumed) — the same resume/invalidate
    contract as run_er_pipeline: identical workdir + config + input resumes
    every stage; changing any of them recomputes from the changed stage on.
    """
    cfg = cfg or CurationConfig()
    mgr = StageManager(
        spark,
        workdir,
        asdict(cfg)
        | {
            "input": _input_fingerprint(documents),
            "benchmark": None if benchmark is None else _input_fingerprint(benchmark),
        },
        enabled=checkpoint,
        store=store,
    )
    if checkpoint:
        # the incremental append validates its cfg against the base run's
        with open(os.path.join(workdir, "curation_meta.json"), "w") as f:
            json.dump({"cfg": asdict(cfg)}, f)

    docs = documents.select("doc_id", "source", "text")

    verdicts = mgr.stage(
        "verdicts", lambda: dedup_verdict_table(docs, cfg, mgr=mgr)
    )

    contaminated = None
    if benchmark is not None:
        contaminated = mgr.stage(
            "contamination",
            lambda: contamination_flags(docs, benchmark, cfg.decontam_k),
        )

    def _kept() -> DataFrame:
        base = (
            verdicts.filter(F.col("verdict") == "keep")
            .join(docs.select("doc_id", "source"), "doc_id")
            .select("doc_id", "source", "n_tokens")
        )
        if contaminated is None:
            return base
        return (
            base.join(contaminated, "doc_id", "left")
            .filter(~F.coalesce("is_contaminated", F.lit(False)))
            .select("doc_id", "source", "n_tokens")
        )

    kept = mgr.stage("kept", _kept)

    mixture = mgr.stage("mixture", lambda: mixture_table(kept, cfg))
    sample = mgr.stage("sample", lambda: budget_sample(kept, mixture))
    eval_slice = mgr.stage(
        "eval_slice",
        lambda: stratified_eval_slice(kept, cfg.eval_per_stratum),
    )

    def _report() -> DataFrame:
        v = (
            verdicts.join(docs.select("doc_id", "source"), "doc_id")
            .groupBy("source")
            .pivot("verdict", ["keep", "drop_exact_dup", "drop_boilerplate"])
            .agg(F.count(F.lit(1)))
            .na.fill(0)
        )
        s = sample.filter("kept").groupBy("source").agg(
            F.count("*").alias("sampled_docs"),
            F.sum("n_tokens").alias("sampled_tokens"),
        )
        return (
            v.join(mixture.select("source", "alloc_tokens"), "source", "left")
            .join(s, "source", "left")
            .na.fill(0, ["sampled_docs", "sampled_tokens", "alloc_tokens"])
            .orderBy("source")
        )

    report = mgr.stage("report", _report, collect_lineage=False)

    out: dict[str, DataFrame] = {
        "verdicts": verdicts,
        "kept": kept,
        "mixture": mixture,
        "sample": sample,
        "eval_slice": eval_slice,
        "report": report,
    }
    if contaminated is not None:
        out["contamination"] = contaminated
    out["_counters"] = mgr.counters  # type: ignore[assignment]
    return out
