"""Validate the reconstructed ELEVANT evaluation semantics against every
committed evaluation artifact in the reference repo.

The reference evaluates linkers with the public ELEVANT harness
(``evaluate.py`` -> ``elevant.evaluation.evaluator``).  Our reconstruction
(`eval/elevant_cases.py`) must reproduce the published
``eval_results.json`` numbers from only (benchmark labels, linker
predictions) — in particular the baseline's headline
IGNORED/mention_types/all row (P=0.6045, R=0.3494, F1=0.4428,
ground_truth=2012), which is the one number a reference user compares.
"""
import glob
import json
import os

import pytest

from wiki_entity_linker_spark.eval.elevant_cases import (
    aggregate, evaluate_article, labels_from_benchmark_json,
    predictions_from_linked_json,
)

BENCH = "/root/reference/benchmarks/wiki-fair-v2.benchmark.jsonl"
RESULT_FILES = sorted(glob.glob(
    "/root/reference/evaluation-results/*/*.wiki-fair-v2.eval_results.json"))

# Reconstruction is exact for these linkers (the two that matter: the
# reference's own baseline and the oracle upper bound) and >=96% of all
# published bucket numbers overall.  The two small known gaps are linker
# output glitches (predictions cutting tokens on the left, quote characters
# inside words) that ELEVANT's internal tokenizer absorbs.
EXACT = {"baseline", "oracle", "dbpedia_spotlight", "genre__yago_",
         "rel__2014_", "spel__large_", "wat"}

needs_reference = pytest.mark.skipif(
    not os.path.exists(BENCH), reason="reference benchmark not available")


def _kb_names():
    names = {}
    for cf in glob.glob("/root/reference/evaluation-results/*/"
                        "*.wiki-fair-v2.eval_cases.jsonl"):
        for ln in open(cf):
            for rc in json.loads(ln):
                for k in ("true_entity", "predicted_entity"):
                    e = rc.get(k)
                    if e and e.get("entity_id") and e.get("name"):
                        names.setdefault(e["entity_id"], e["name"])
    return names


def _run(linker_base, arts, names):
    linked = [json.loads(ln) for ln in open(linker_base + ".linked_articles.jsonl")]
    all_cases = []
    for art_pred in linked:
        art = arts[art_pred["id"]]
        labels = labels_from_benchmark_json(art["labels"])
        preds = predictions_from_linked_json(art_pred.get("entity_mentions", []))
        for p in preds:
            if not p.name:
                p.name = names.get(p.entity_id, "")
        es = tuple(art["evaluation_span"]) if art.get("evaluation_span") else None
        all_cases.append(evaluate_article(art["text"], labels, preds, es))
    return all_cases


@needs_reference
def test_baseline_headline_exact():
    """The one number a reference user compares: baseline wiki-fair-v2."""
    arts = {json.loads(ln)["id"]: json.loads(ln) for ln in open(BENCH)}
    base = ("/root/reference/evaluation-results/baseline/"
            "baseline.wiki-fair-v2")
    got = aggregate(_run(base, arts, _kb_names()), "IGNORED")["all"]
    want = json.load(open(base + ".eval_results.json"))
    wrow = want["IGNORED"]["mention_types"]["all"]
    assert got["true_positives"] == wrow["true_positives"] == 703
    assert got["false_positives"] == wrow["false_positives"] == 460
    assert got["false_negatives"] == wrow["false_negatives"] == 1309
    assert got["ground_truth"] == wrow["ground_truth"] == 2012
    assert abs(got["f1"] - 0.44283464566929137) < 1e-12


@needs_reference
@pytest.mark.parametrize("resf", RESULT_FILES,
                         ids=[f.split("/")[-1].split(".")[0] for f in RESULT_FILES])
def test_all_linkers_buckets(resf):
    arts = {json.loads(ln)["id"]: json.loads(ln) for ln in open(BENCH)}
    names = _kb_names()
    base = resf[: -len(".eval_results.json")]
    linker = base.split("/")[-1].split(".")[0]
    if not os.path.exists(base + ".linked_articles.jsonl"):
        pytest.skip("no linked articles for this linker")
    want = json.load(open(resf))
    all_cases = _run(base, arts, names)
    total = bad = 0
    for mode in ("IGNORED", "REQUIRED"):
        got = aggregate(all_cases, mode)
        for bucket, row in got.items():
            wrow = want[mode]["mention_types"][bucket]
            for k in ("true_positives", "false_positives",
                      "false_negatives", "ground_truth"):
                total += 1
                if row[k] != wrow[k]:
                    bad += 1
    if linker in EXACT:
        assert bad == 0, f"{linker}: {bad}/{total} bucket numbers diverge"
    else:
        # known glitch linkers: still >=75% of numbers must match and the
        # headline row must be within 3 counts
        assert bad <= total * 0.25
        grow = aggregate(all_cases, "IGNORED")["all"]
        wrow = want["IGNORED"]["mention_types"]["all"]
        for k in ("true_positives", "false_positives", "false_negatives"):
            assert abs(grow[k] - wrow[k]) <= 3


@needs_reference
def test_spark_path_matches_reference(spark):
    """The distributed evaluator (applyInPandas cases + JVM aggregation)
    reproduces the committed baseline eval_results exactly."""
    from pyspark.sql import functions as F

    from wiki_entity_linker_spark.eval.elevant_spark import (
        evaluate_cases, results_dict)
    from wiki_entity_linker_spark.sources.tables import read_articles_jsonl

    arts = read_articles_jsonl(spark, BENCH)
    linked = read_articles_jsonl(
        spark, "/root/reference/evaluation-results/baseline/"
               "baseline.wiki-fair-v2.linked_articles.jsonl")
    preds = (
        linked.select(F.col("id").alias("article_id"),
                      F.explode("entity_mentions").alias("m"))
        .select("article_id",
                F.element_at("m.span", 1).alias("start"),
                F.element_at("m.span", 2).alias("end"),
                F.col("m.id").alias("entity_id")))
    got = results_dict(evaluate_cases(arts, preds))
    want = json.load(open(
        "/root/reference/evaluation-results/baseline/"
        "baseline.wiki-fair-v2.eval_results.json"))
    for mode in ("IGNORED", "REQUIRED"):
        for bucket in ("all", "entity", "coref"):
            g = got[mode]["mention_types"][bucket]
            w = want[mode]["mention_types"][bucket]
            for k in ("true_positives", "false_positives",
                      "false_negatives", "ground_truth"):
                assert g[k] == w[k], (mode, bucket, k, g[k], w[k])


@needs_reference
@pytest.mark.parametrize("bench_name", [
    "wiki-fair", "wiki-fair-no-coref", "wiki-fair-v2-no-coref"])
@pytest.mark.parametrize("linker", ["baseline", "oracle"])
def test_other_benchmarks_exact(bench_name, linker):
    """The evaluator generalizes: the reference's own baseline and oracle
    reproduce every published bucket number on the v1 benchmark (no coref
    annotations -> text-derived coref classification) and both no-coref
    variants."""
    bpath = f"/root/reference/benchmarks/{bench_name}.benchmark.jsonl"
    base = (f"/root/reference/evaluation-results/{linker}/"
            f"{linker}.{bench_name}")
    if not os.path.exists(base + ".linked_articles.jsonl"):
        pytest.skip("artifacts not present")
    arts = {json.loads(ln)["id"]: json.loads(ln) for ln in open(bpath)}
    names = {}
    for cf in glob.glob(f"/root/reference/evaluation-results/*/"
                        f"*.{bench_name}.eval_cases.jsonl"):
        for ln in open(cf):
            for rc in json.loads(ln):
                for k in ("true_entity", "predicted_entity"):
                    e = rc.get(k)
                    if e and e.get("entity_id") and e.get("name"):
                        names.setdefault(e["entity_id"], e["name"])
    want = json.load(open(base + ".eval_results.json"))
    all_cases = _run(base, arts, names)
    for mode in ("IGNORED", "REQUIRED"):
        got = aggregate(all_cases, mode)
        for bucket, row in got.items():
            wrow = want[mode]["mention_types"][bucket]
            for k in ("true_positives", "false_positives",
                      "false_negatives", "ground_truth"):
                assert row[k] == wrow[k], (mode, bucket, k, row[k], wrow[k])


def test_empty_inputs_do_not_crash():
    """Degenerate articles: no labels, no predictions, empty text."""
    from wiki_entity_linker_spark.eval.elevant_cases import (
        Label, Prediction)

    assert evaluate_article("", [], []) == []
    lab = [Label(0, (0, 3), "Q1", "Foo")]
    cases = evaluate_article("Foo bar", lab, [])
    assert len(cases) == 1
    assert cases[0].eval_types["IGNORED"] == ("FN",)
    # prediction on empty label set -> one FP case
    cases = evaluate_article(
        "Foo bar", [], [Prediction((0, 3), "Q1", "Foo")])
    assert len(cases) == 1
    assert cases[0].eval_types["IGNORED"] == ("FP",)
    # aggregation over empty case lists
    out = aggregate([[]], "IGNORED")
    assert out["all"]["ground_truth"] == 0 and out["all"]["f1"] == 0


@needs_reference
def test_inexact_linkers_residual_documented():
    """The two non-EXACT linkers' residual is pinned per-case: the committed
    diff artifacts (scripts/elevant_case_diff.py) list EVERY divergent case,
    the regeneration here must match them exactly, and the divergence stays
    under 0.3% of cases — all of it at token-cut/quote-glitch predictions
    that ELEVANT's internal tokenizer absorbs (upstream linker output, not a
    counting bug)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "elevant_case_diff",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts", "elevant_case_diff.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    arts = [json.loads(ln) for ln in open(BENCH)]
    names = mod._kb_names()
    for linker_rel in mod.INEXACT:
        got = mod.diff_linker(linker_rel, arts, names)
        art_path = os.path.join(
            mod.OUT_DIR, f"elevant_case_diff.{got['linker']}.wiki-fair-v2.json")
        committed = json.load(open(art_path))
        assert got == committed, f"{got['linker']}: artifact stale — re-run the script"
        assert got["divergence_rate"] < 0.003
