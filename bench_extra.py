"""Round-7 optimization harness (bench.py is FROZEN for measurement; this
file exists so the optimization work can time queries in isolation, dump
physical plans, and A/B sub-phases — guide §1.1/§1.4/§1.5).

Usage:
  python bench_extra.py --queries minhash_neardup kcore_dense --sf1 -n 2
  python bench_extra.py --queries ngram_jaccard --plans plans/r07 --suffix before
  python bench_extra.py --all-sf1          # every SF1_QUERIES entry once

Prints one JSON line per query: {"name": ..., "secs": [..], "best": ..}.
The sf1 directory is the same deterministic 10x replication bench.py uses
(fixtures.scale_up.ensure_scaled_sf).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=[])
    ap.add_argument("--all-sf1", action="store_true")
    ap.add_argument("--sf1", action="store_true", help="run at the 10x dir")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("-n", type=int, default=2)
    ap.add_argument("--plans", default=None, help="dir to write explain() to")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from wiki_entity_linker_spark import queries as q
    from wiki_entity_linker_spark.session import get_spark

    spark = get_spark("bench-extra")
    qs = q.queries()
    sf_dir = args.sf_dir
    names = list(args.queries)
    if args.all_sf1:
        import bench

        names = [n for n in bench.SF1_QUERIES if n not in names] + names
    if args.sf1 or args.all_sf1:
        from wiki_entity_linker_spark.fixtures.scale_up import ensure_scaled_sf

        sf_dir = ensure_scaled_sf(spark, args.sf_dir)
    # warmup (session/JIT), not billed to the first query
    _force(qs["agg_link_frequency"](spark, args.sf_dir))
    out = {}
    for name in names:
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = qs[name](spark, sf_dir)
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        secs = []
        for _ in range(args.n):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            _force(qs[name](spark, sf_dir))
            secs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        if not secs:  # -n 0: plans only, no timing
            print(json.dumps({"name": name, "plan": "dumped"}), flush=True)
            continue
        out[name] = min(secs)
        print(json.dumps({"name": name, "secs": secs, "best": min(secs)}),
              flush=True)
    print(json.dumps({"total_best": round(sum(out.values()), 3),
                      "sf_dir": sf_dir, "n": args.n}))
    spark.stop()


if __name__ == "__main__":
    main()
