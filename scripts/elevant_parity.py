"""Dev harness: diff our reconstructed ELEVANT case semantics against every
committed eval_cases/eval_results artifact in the reference repo.

Usage: python scripts/elevant_parity.py [--cases]
"""
import glob
import json
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")
from wiki_entity_linker_spark.eval.elevant_cases import (
    aggregate, evaluate_article, labels_from_benchmark_json,
    predictions_from_linked_json,
)

BENCH = "/root/reference/benchmarks/wiki-fair-v2.benchmark.jsonl"
RESULTS = sorted(glob.glob(
    "/root/reference/evaluation-results/*/*.wiki-fair-v2.eval_results.json"))


def kb_names() -> dict:
    """QID -> entity name, approximated from the committed artifacts (the
    real harness uses a Wikidata dump; predictions only need names for the
    named/non-named mention split)."""
    names = {}
    for cf in glob.glob(
            "/root/reference/evaluation-results/*/*.wiki-fair-v2.eval_cases.jsonl"):
        for ln in open(cf):
            for rc in json.loads(ln):
                for k in ("true_entity", "predicted_entity"):
                    e = rc.get(k)
                    if e and e.get("entity_id") and e.get("name"):
                        names.setdefault(e["entity_id"], e["name"])
    return names


def main(show_cases: bool) -> int:
    arts = {}
    for ln in open(BENCH):
        a = json.loads(ln)
        arts[a["id"]] = a
    names = kb_names()
    total_checks = bad_checks = 0
    case_mismatch = Counter()
    for resf in RESULTS:
        base = resf[: -len(".eval_results.json")]
        name = base.split("/")[-1]
        try:
            linked = [json.loads(ln) for ln in open(base + ".linked_articles.jsonl")]
            ref_cases = [json.loads(ln) for ln in open(base + ".eval_cases.jsonl")]
        except FileNotFoundError:
            continue
        want = json.load(open(resf))
        all_cases = []
        for art_pred, ref_cs in zip(linked, ref_cases):
            art = arts[art_pred["id"]]
            labels = labels_from_benchmark_json(art["labels"])
            preds = predictions_from_linked_json(art_pred.get("entity_mentions", []))
            for p in preds:
                if not p.name:
                    p.name = names.get(p.entity_id, "")
            es = tuple(art["evaluation_span"]) if art.get("evaluation_span") else None
            cases = evaluate_article(art["text"], labels, preds, es)
            all_cases.append(cases)
            if show_cases:
                # index reference cases by label id / span for comparison
                ref_by_label = {}
                ref_by_span = {}
                for rc in ref_cs:
                    te = rc.get("true_entity")
                    if te is not None:
                        ref_by_label[te["id"]] = rc
                    else:
                        ref_by_span[tuple(rc["span"])] = rc
                for c in cases:
                    if c.label is not None:
                        rc = ref_by_label.get(c.label.label_id)
                    else:
                        rc = ref_by_span.get(tuple(c.span))
                    if rc is None:
                        case_mismatch[("missing_ref", name)] += 1
                        continue
                    for mode in ("IGNORED", "REQUIRED"):
                        gotT = tuple(sorted(c.eval_types.get(mode, ())))
                        wantT = tuple(sorted(rc["linking_eval_types"][mode]))
                        if gotT != wantT:
                            key = ("types", mode,
                                   c.label.kind if c.label else "pred",
                                   "child" if c.is_child else
                                   ("parent" if (c.label and c.label.children) else "plain"),
                                   gotT, wantT)
                            case_mismatch[key] += 1
                            if case_mismatch[key] <= 2 and "-v" in sys.argv:
                                print("  ex:", name, art["id"], c.span,
                                      repr(art["text"][c.span[0]:c.span[1]])[:40],
                                      c.label.entity_id if c.label else None,
                                      c.prediction.entity_id if c.prediction else None)
                    if c.mention_type != rc["mention_type"]:
                        case_mismatch[("mention", c.mention_type, rc["mention_type"])] += 1
        for mode in ("IGNORED", "REQUIRED"):
            got = aggregate(all_cases, mode)
            for bucket, row in got.items():
                wrow = want[mode]["mention_types"][bucket]
                for k in ("true_positives", "false_positives", "false_negatives",
                          "ground_truth"):
                    total_checks += 1
                    if row[k] != wrow[k]:
                        bad_checks += 1
                        print(f"MISMATCH {name} {mode} {bucket} {k}: "
                              f"got {row[k]} want {wrow[k]}")
    print(f"\nresult checks: {total_checks - bad_checks}/{total_checks} pass")
    if show_cases:
        print("case-level mismatches:")
        for k, v in sorted(case_mismatch.items(), key=lambda x: -x[1])[:30]:
            print(" ", v, k)
    return 1 if bad_checks else 0


if __name__ == "__main__":
    sys.exit(main("--cases" in sys.argv))
