"""Per-case diff between the reconstructed ELEVANT evaluator and the
reference's committed ``eval_cases.jsonl`` — for the linkers whose bucket
numbers are not bit-exact (tests/test_elevant_eval.py EXACT set).

Purpose (VERDICT r4 #6): prove the residual divergence is upstream linker
OUTPUT (predictions cutting tokens / quote characters inside words that
ELEVANT's internal tokenizer absorbs), not a counting bug in the
reconstruction. For every divergent case this script records the article,
span, both sides' eval types, and the raw text slices of the gold label and
the nearest prediction, then writes one JSON artifact per linker under
``eval_results/``.

Run: ``python scripts/elevant_case_diff.py`` (needs /root/reference).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wiki_entity_linker_spark.eval.elevant_cases import (  # noqa: E402
    evaluate_article,
    labels_from_benchmark_json,
    predictions_from_linked_json,
)

BENCH = "/root/reference/benchmarks/wiki-fair-v2.benchmark.jsonl"
RESULTS = "/root/reference/evaluation-results"
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "eval_results")
INEXACT = ("ambiverse/ambiverse", "refined/refined__aida_")


def _kb_names() -> dict:
    import glob

    names: dict = {}
    for cf in glob.glob(f"{RESULTS}/*/*.wiki-fair-v2.eval_cases.jsonl"):
        for ln in open(cf):
            for rc in json.loads(ln):
                for k in ("true_entity", "predicted_entity"):
                    e = rc.get(k)
                    if e and e.get("entity_id") and e.get("name"):
                        names.setdefault(e["entity_id"], e["name"])
    return names


def diff_linker(linker_rel: str, arts: list[dict], names: dict) -> dict:
    base = f"{RESULTS}/{linker_rel}.wiki-fair-v2"
    linked = {
        j["id"]: j
        for j in (json.loads(ln) for ln in open(base + ".linked_articles.jsonl"))
    }
    committed = [json.loads(ln) for ln in open(base + ".eval_cases.jsonl")]
    assert len(committed) == len(arts)

    divergent = []
    n_cases = 0
    for art, ref_cases in zip(arts, committed):
        text = art["text"]
        labels = labels_from_benchmark_json(art["labels"])
        preds = predictions_from_linked_json(
            linked[art["id"]].get("entity_mentions", []))
        for p in preds:
            if not p.name:
                p.name = names.get(p.entity_id, "")
        es = tuple(art["evaluation_span"]) if art.get("evaluation_span") else None
        ours = evaluate_article(text, labels, preds, es)

        # index both sides by span; compare the linking eval types per mode
        ours_by_span = {tuple(c.span): c for c in ours}
        theirs_by_span = {tuple(c["span"]): c for c in ref_cases}
        n_cases += len(theirs_by_span)
        for span in sorted(set(ours_by_span) | set(theirs_by_span)):
            oc, tc = ours_by_span.get(span), theirs_by_span.get(span)
            o_types = {
                m: sorted(oc.eval_types.get(m, ())) if oc else None
                for m in ("IGNORED", "REQUIRED")
            }
            t_types = {
                m: sorted(tc["linking_eval_types"].get(m, [])) if tc else None
                for m in ("IGNORED", "REQUIRED")
            }
            if o_types == t_types:
                continue
            # nearest prediction by span distance — the usual culprit is a
            # prediction whose raw span cuts a token or includes a quote
            near = min(
                preds,
                key=lambda p: abs(p.span[0] - span[0]) + abs(p.span[1] - span[1]),
                default=None,
            )
            divergent.append({
                "article_id": art["id"],
                "span": list(span),
                "gold_text": text[span[0]:span[1]],
                "ours": o_types,
                "committed": t_types,
                "nearest_prediction": None if near is None else {
                    "span": list(near.span),
                    "raw_text": text[near.span[0]:near.span[1]],
                    "entity_id": near.entity_id,
                },
            })
    return {
        "linker": linker_rel.split("/")[-1],
        "benchmark": "wiki-fair-v2",
        "total_committed_cases": n_cases,
        "divergent_cases": len(divergent),
        "divergence_rate": round(len(divergent) / n_cases, 5),
        "cases": divergent,
    }


def main() -> None:
    arts = [json.loads(ln) for ln in open(BENCH)]
    names = _kb_names()
    for linker_rel in INEXACT:
        d = diff_linker(linker_rel, arts, names)
        out = os.path.join(
            OUT_DIR, f"elevant_case_diff.{d['linker']}.wiki-fair-v2.json")
        with open(out, "w") as f:
            json.dump(d, f, indent=1)
        print(f"{d['linker']}: {d['divergent_cases']}/{d['total_committed_cases']} "
              f"cases diverge → {out}")
        for c in d["cases"][:8]:
            print(f"  art {c['article_id']} span {c['span']} "
                  f"gold={c['gold_text']!r} pred={c['nearest_prediction']}")


if __name__ == "__main__":
    main()
