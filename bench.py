"""Benchmark harness.

Default mode (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Extra modes (scaling evidence for BASELINE.md, north_rule two-cluster-size
criterion — no real cluster in this sandbox, so the same job runs at two
parallelism levels):

* ``--er-run --cpus N [--scale bench]`` — one ER-pipeline run, prints JSON;
* ``--scaling`` — spawns ``--er-run`` subprocesses at 8 and 32 cores on the
  identical corpus and prints throughput + efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "agg_link_frequency",
    "argmax_with_ties",
    "dim_join_rollup",
    "best_candidate_rank",
    "interval_join_events",
    "window_rank_events",
    "connected_components",
    "transitive_closure",
    "sha_exact_dedup",
    "minhash_neardup",
    "ngram_jaccard",
    "simhash_fingerprint",
    "embedding_cosine_topk",
    "er_cluster_documents",
]


# data-bound queries that get an extra measurement at ~sf1 (10x sf0.1):
# at sf0.1 they finish in a few seconds where shared-host noise is ~20%,
# so regressions can hide; the scaled leg raises the floor 10x.
# (connected_components / transitive_closure are excluded: their graphs are
# fixed-size synthetics, so they do not scale with sf.)
SF1_QUERIES = [
    "ngram_jaccard",
    "minhash_neardup",
    "er_cluster_documents",
    # round 4: incremental append (90% base + 10% batch probe) measured at
    # the same 10x floor — a regression in the probe/merge path would hide
    # at sf0.1. First recorded in BENCH_r04 alongside the rest of this leg.
    "er_incremental_documents",
    "interval_join_events",
    "sha_exact_dedup",
    # round 5 (VERDICT r4 #7): the round-4 operators get noise-proof
    # round-over-round numbers at the same 10x floor — the window-function
    # coref core and the distributed ELEVANT counting aggregation
    "coref_antecedent_window",
    "elevant_counting",
    # round 5 additions: the explode-heavy text ops and the two-level
    # global prefix sum, all data-bound
    "doc_repetition_stats",
    "decontamination_flags",
    "sequence_packing",
    # round 5, second batch: regex scrubbing, chunk explode, retrieval,
    # and the per-source budget window — all scale with the corpus
    "pii_redaction",
    "doc_chunks",
    "bm25_topk",
    "token_budget_sample",
    "segment_dedup",
    "length_quantiles",
    # round 5, third batch: suffix-array-semantics dedup — the gram explode
    # plus two gram-keyed shuffles are all data-bound
    "exact_substring_dup",
    "source_overlap",
    "winnowing_pairs",
    "dup_graph_pagerank",
    "allpairs_jaccard",
    "collocation_lift",
    "vocab_coverage",
    "sorted_neighborhood",
    "dedup_verdicts",
    # bloom path vs the exact decontamination path: same answer, row-local
    # membership — the sf1 leg shows the plan-shape difference in seconds
    "bloom_decontamination",
    "label_centroids",
    # round 5, fourth batch: ER-metric rollups on the flagship clustering,
    # the temporal union-merge join, and the vectorized quantization pass
    "bcubed_eval",
    "asof_join_events",
    "embedding_quantization",
    # round 5, fifth batch: the graph loops (peel/matching), the FS
    # scoring chain, and the islands window collapse — all data-bound
    "kcore_dense",
    "onetoone_matching",
    "fellegi_sunter_scores",
    "value_islands",
    # round 6: meta-blocking (df-capped postings + pair agg), distributed
    # lattice Lloyd, the curation-kept composition, and the two text
    # scorers. semantic_dedup / soundex_fuzzy_pairs are EXCLUDED on
    # purpose: the 10x replication fixture turns every doc into a 10-clone
    # family, so their within-block pair counts grow ~100x by construction
    # (answer size, not plan waste) — the sf0.01 oracle and the headline
    # leg cover them.
    "meta_blocking",
    "kmeans_lloyd",
    "curation_kept",
    "tfidf_keywords",
    "unigram_surprisal",
]


def _force(df) -> int:
    """Materialize fully without collecting to the driver."""
    return df.write.format("noop").mode("overwrite").save() or 0


def run_headline(sf_dir: str, cpus: int | None, repeats: int = 2) -> dict:
    """Warm session + best-of-``repeats`` per query + host-load recording,
    so round-over-round per-query deltas are signal, not shared-host noise
    (the r1→r2 'regressions' were warmup drift and neighbor load)."""
    from wiki_entity_linker_spark import queries as q
    from wiki_entity_linker_spark.session import get_spark

    waited = _wait_for_idle()
    load_before = _loadavg()
    ticks0 = _cpu_ticks()
    spark = get_spark("bench", cores=cpus)
    qs = q.queries()
    # warmup: session/JIT/codegen spin-up must not be billed to the first
    # query in the loop (it inflated agg_link_frequency by ~4s in r1)
    _force(qs["agg_link_frequency"](spark, sf_dir))
    times: dict[str, float] = {}
    t_all = time.time()
    for name in HEADLINE:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            _force(qs[name](spark, sf_dir))
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)
    wall = round(time.time() - t_all, 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline_queries_total",
        # value = Σ per-query best (the comparable number); "wall" is the
        # raw loop time including the non-best repeats
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_per_query": repeats,
        "protocol": f"sum_of_best_of_{repeats}",  # r1/r2 were single-shot wall
        "wall": wall,
        "host_load_before": round(load_before, 2),
        "host_load_after": round(_loadavg(), 2),
        "idle_wait_sec": waited,
        # hypervisor steal ACROSS the headline leg: the honest contention
        # number (loadavg can read 0.2 while neighbors steal >10%)
        "host_steal_pct": _steal_pct(ticks0, _cpu_ticks()),
    }
    # sf1 leg (VERDICT r3 #6): the data-bound expensive queries once more
    # on deterministically 10x-scaled tables; single-shot (the 10x floor
    # dominates noise), recorded under "sf1" so rounds stay comparable
    if os.environ.get("SPARK_GRAFT_SKIP_SF1") != "1" and sf_dir.endswith("0.1"):
        from wiki_entity_linker_spark.fixtures.scale_up import ensure_scaled_sf

        sf1_dir = ensure_scaled_sf(spark, sf_dir)
        sf1_times: dict[str, float] = {}
        for name in SF1_QUERIES:
            # best-of-2 here too: a single-shot leg is hostage to neighbor
            # bursts on the shared host (observed 19s vs 175s for the same
            # query inside one session)
            best = float("inf")
            for _ in range(repeats):
                t0 = time.time()
                _force(qs[name](spark, sf1_dir))
                best = min(best, time.time() - t0)
            sf1_times[name] = round(best, 3)
        out["sf1"] = {
            "queries": sf1_times,
            "total": round(sum(sf1_times.values()), 3),
            "scale": "sf0.1 x10 deterministic replication",
            "n_per_query": repeats,
            "protocol": f"sum_of_best_of_{repeats}",
        }
    spark.stop()
    return out


def run_er(scale: str, cpus: int, corpus_root: str) -> dict:
    from wiki_entity_linker_spark.fixtures.corpus import ensure_corpus
    from wiki_entity_linker_spark.plans.er_pipeline import run_er_pipeline
    from wiki_entity_linker_spark.session import get_spark

    d = ensure_corpus(corpus_root, scale)
    spark = get_spark("bench-er", cores=cpus)
    sf = spark.read.parquet(f"{d}/source_files.parquet")
    n_files = sf.count()
    ticks0 = _cpu_ticks()
    t0 = time.time()
    out = run_er_pipeline(spark, sf, None, workdir="", checkpoint=False)
    n_clusters = out["assignment"].select("component").distinct().count()
    wall = time.time() - t0
    steal = _steal_pct(ticks0, _cpu_ticks())
    out["_cleanup"]()
    spark.stop()
    return {
        "metric": "er_pipeline_wall",
        "value": round(wall, 2),
        "unit": "sec",
        "cpus": cpus,
        "files": n_files,
        "clusters": n_clusters,
        "files_per_sec": round(n_files / wall, 2),
        "scale": scale,
        "host_steal_pct": steal,
    }


def _loadavg() -> float:
    # host-wide (NOT cgroup-scoped): records how contended the shared box was
    return os.getloadavg()[0]


def _cpu_ticks() -> tuple[int, int]:
    """(steal_ticks, total_ticks) from /proc/stat — loadavg misses
    hypervisor-level contention entirely (round 6: a uniform ~1.4x
    slowdown at loadavg 0.2 turned out to be ~12% steal while this guest
    was near-idle), so every bench leg records the steal fraction ACROSS
    its own run."""
    parts = open("/proc/stat").readline().split()[1:]
    vals = list(map(int, parts))
    return (vals[7] if len(vals) > 7 else 0, sum(vals))


def _steal_pct(before: tuple[int, int], after: tuple[int, int]) -> float:
    ds, dt = after[0] - before[0], after[1] - before[1]
    return round(100.0 * ds / dt, 2) if dt > 0 else 0.0


def _wait_for_idle() -> float:
    """Hold the bench until the shared host quiets down (VERDICT r5 #4:
    the committed r5 leg ran at load 4.14 and carried six phantom per-query
    regressions the idle rerun contradicted). Polls 1-min loadavg until it
    drops under ``SPARK_GRAFT_MAX_LOAD`` (default 2.0) or the budget
    ``SPARK_GRAFT_IDLE_WAIT`` seconds (default 600) runs out — then runs
    anyway and records the load, so an unattended driver never deadlocks.
    Returns seconds waited. Disable with SPARK_GRAFT_MAX_LOAD=0."""
    max_load = float(os.environ.get("SPARK_GRAFT_MAX_LOAD", "2.0"))
    budget = float(os.environ.get("SPARK_GRAFT_IDLE_WAIT", "600"))
    if max_load <= 0:
        return 0.0
    t0 = time.time()
    while _loadavg() > max_load and time.time() - t0 < budget:
        print(
            f"# load {_loadavg():.2f} > {max_load}: waiting for idle window",
            file=sys.stderr, flush=True,
        )
        time.sleep(15)
    return round(time.time() - t0, 1)


def run_scaling(
    scale: str, corpus_root: str, lo: int = 8, hi: int = 32, repeats: int = 2
) -> dict:
    """Same job at two parallelism levels (north_rule N vs 4N evidence).

    The sandbox host is shared, so single measurements are contaminated by
    neighbor load; each config runs ``repeats`` times in alternating order
    and the BEST run per config (least-contended) is scored. Host loadavg is
    recorded alongside every run for transparency.
    """
    from wiki_entity_linker_spark.fixtures.corpus import ensure_corpus

    ensure_corpus(corpus_root, scale)  # generate once so all runs share it
    runs: dict[int, list[dict]] = {lo: [], hi: []}
    for _ in range(repeats):
        for cpus in (lo, hi):
            load_before = _loadavg()
            # CPU-affinity cap: local[N] bounds JVM task threads but NOT the
            # pandas-UDF python workers — an uncapped "8-core" run actually
            # burns up to 2N cores, silently inflating the small config and
            # corrupting the N-vs-4N comparison. taskset pins the whole
            # process tree (JVM + python workers) to exactly N CPUs, which is
            # what an N-core executor would get on a real cluster.
            cmd = [
                "taskset", "-c", f"0-{cpus - 1}",
                sys.executable, os.path.abspath(__file__),
                "--er-run", "--cpus", str(cpus), "--scale", scale,
                "--corpus-root", corpus_root,
            ]
            proc = subprocess.run(cmd, capture_output=True, text=True, check=True)
            r = json.loads(proc.stdout.strip().splitlines()[-1])
            r["host_load_before"] = round(load_before, 2)
            runs[cpus].append(r)
            print(json.dumps(r), file=sys.stderr, flush=True)
    best = {c: min(rs, key=lambda r: r["value"]) for c, rs in runs.items()}
    t_lo, t_hi = best[lo]["value"], best[hi]["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "er_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "lo_cpus": lo,
        "hi_cpus": hi,
        "lo": best[lo],
        "hi": best[hi],
        "all_runs": {str(c): rs for c, rs in runs.items()},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--er-run", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scale", default="bench")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--corpus-root", default="/tmp/er_bench_corpus")
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--hi", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    if args.scaling:
        out = run_scaling(args.scale, args.corpus_root, args.lo, args.hi, args.repeats)
    elif args.er_run:
        out = run_er(args.scale, args.cpus or 32, args.corpus_root)
    else:
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        env_cpus = os.environ.get("SPARK_GRAFT_CPUS")
        out = run_headline(sf_dir, int(env_cpus) if env_cpus else None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
