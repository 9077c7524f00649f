"""Distributed ELEVANT-semantics evaluation.

The scalar semantics live in ``elevant_cases.py`` (validated case-by-case
against the reference's committed artifacts, see tests/test_elevant_eval.py).
This module recasts them for Spark:

* ``evaluate_cases`` — one ``applyInPandas`` pass grouped by article.  The
  case generator is per-article tree logic (nested label families) that
  relational operators cannot express cleanly; articles are independent, so
  grouping by article gives perfect data parallelism — on a cluster each
  task evaluates a disjoint slice of articles, no shuffle beyond the
  group-by.  Arrow moves only (article_id, text, labels, predictions),
  never the corpus.
* ``aggregate_results`` — pure JVM-side DataFrame aggregation of the case
  rows into the reference's ``mention_types`` results table (the counting
  rule: parent/plain cases count every eval type, child cases count only
  FPs).

Reference parity anchor: running the reference baseline's own predictions
through this path reproduces ``baseline.wiki-fair-v2.eval_results.json``
exactly (TP=703 FP=460 FN=1309 GT=2012, F1=0.4428) — see
tests/test_elevant_eval.py::test_spark_path_matches_scalar.
"""
from __future__ import annotations

from typing import Iterable, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wiki_entity_linker_spark.eval.elevant_cases import (
    MENTION_BUCKETS, Case, Label, Prediction, evaluate_article,
)

CASE_SCHEMA = T.StructType(
    [
        T.StructField("article_id", T.LongType()),
        T.StructField("span_start", T.LongType()),
        T.StructField("span_end", T.LongType()),
        T.StructField("mention_type", T.StringType()),
        T.StructField("is_child", T.BooleanType()),
        T.StructField("optional", T.BooleanType()),
        T.StructField("ignored_types", T.ArrayType(T.StringType())),
        T.StructField("required_types", T.ArrayType(T.StringType())),
    ]
)


def _cases_to_rows(article_id: int, cases: Iterable[Case]) -> list[dict]:
    return [
        {
            "article_id": article_id,
            "span_start": c.span[0],
            "span_end": c.span[1],
            "mention_type": c.mention_type,
            "is_child": c.is_child,
            "optional": c.optional,
            "ignored_types": list(c.eval_types.get("IGNORED", ())),
            "required_types": list(c.eval_types.get("REQUIRED", ())),
        }
        for c in cases
    ]


def evaluate_cases(articles: DataFrame, predictions: DataFrame) -> DataFrame:
    """Generate one evaluation-case row per gold label / unmatched prediction.

    ``articles``: the benchmark Article frame (id, text, evaluation_span,
    labels) — sources/tables.py schema.
    ``predictions``: (article_id, start, end, entity_id[, name]) flat rows.
    """
    if "name" not in predictions.columns:
        predictions = predictions.withColumn("name", F.lit(""))
    preds = (
        predictions.groupBy("article_id")
        .agg(
            F.collect_list(
                F.struct("start", "end", "entity_id", "name")
            ).alias("preds")
        )
    )
    arts = articles.select(
        F.col("id").alias("article_id"), "text", "evaluation_span", "labels"
    )
    joined = arts.join(preds, "article_id", "left")

    def _eval(pdf: pd.DataFrame) -> pd.DataFrame:
        rows: list[dict] = []
        for rec in pdf.itertuples(index=False):
            labels = [
                Label(
                    label_id=int(l["id"]),
                    span=(int(l["span"][0]), int(l["span"][1])),
                    entity_id=l["entity_id"] or "",
                    name=l["name"] or "",
                    # None (not False) when the benchmark has no coref
                    # annotation: the kernel then derives coref-ness from
                    # the mention text (wiki-fair v1 semantics)
                    coref=None if l["coref"] is None else bool(l["coref"]),
                    optional=bool(l["optional"]),
                    desc=bool(l["desc"]),
                    parent=None if l["parent"] is None or pd.isna(l["parent"])
                    else int(l["parent"]),
                    children=tuple(
                        int(k)
                        for k in (l["children"] if l["children"] is not None
                                  else [])
                        if k is not None),
                )
                for l in (rec.labels if rec.labels is not None else [])
            ]
            plist = [
                Prediction(
                    span=(int(p["start"]), int(p["end"])),
                    entity_id=p["entity_id"],
                    name=p["name"] or "",
                )
                for p in (rec.preds if rec.preds is not None else [])
            ]
            es = None
            if rec.evaluation_span is not None and len(rec.evaluation_span) == 2:
                es = (int(rec.evaluation_span[0]), int(rec.evaluation_span[1]))
            cases = evaluate_article(rec.text or "", labels, plist, es)
            rows.extend(_cases_to_rows(int(rec.article_id), cases))
        return pd.DataFrame(
            rows, columns=[f.name for f in CASE_SCHEMA.fields])

    return joined.groupBy("article_id").applyInPandas(_eval, CASE_SCHEMA)


def aggregate_results(cases: DataFrame, mode: str = "IGNORED") -> DataFrame:
    """Reduce case rows to per-bucket (tp, fp, fn, ground_truth, p, r, f1).

    JVM-side: explode the eval types, drop child non-FP contributions
    (the family outcome is carried by the parent case), then a single
    groupBy over mention_type and a bucket rollup.
    """
    type_col = "ignored_types" if mode == "IGNORED" else "required_types"
    per_type = (
        cases.select("mention_type", "is_child",
                     F.explode(type_col).alias("t"))
        .filter(~F.col("is_child") | (F.col("t") == "FP"))
        .groupBy("mention_type")
        .agg(
            F.sum(F.when(F.col("t") == "TP", 1).otherwise(0)).alias("tp"),
            F.sum(F.when(F.col("t") == "FP", 1).otherwise(0)).alias("fp"),
            F.sum(F.when(F.col("t") == "FN", 1).otherwise(0)).alias("fn"),
        )
    )
    bucket_rows = [
        (bucket, mt) for bucket, mts in MENTION_BUCKETS.items() for mt in mts
    ]
    spark = cases.sparkSession
    buckets = spark.createDataFrame(bucket_rows, ["bucket", "mention_type"])
    agg = (
        per_type.join(F.broadcast(buckets), "mention_type")
        .groupBy("bucket")
        .agg(F.sum("tp").alias("tp"), F.sum("fp").alias("fp"),
             F.sum("fn").alias("fn"))
        .withColumn("ground_truth", F.col("tp") + F.col("fn"))
        .withColumn(
            "precision",
            F.when(F.col("tp") + F.col("fp") > 0,
                   F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(F.lit(0.0)))
        .withColumn(
            "recall",
            F.when(F.col("ground_truth") > 0,
                   F.col("tp") / F.col("ground_truth")).otherwise(F.lit(0.0)))
        .withColumn(
            "f1",
            F.when(F.col("precision") + F.col("recall") > 0,
                   2 * F.col("precision") * F.col("recall")
                   / (F.col("precision") + F.col("recall"))).otherwise(F.lit(0.0)))
    )
    return agg


def results_dict(cases: DataFrame) -> dict:
    """Both modes as the reference's eval_results.json ``mention_types``
    shape (missing buckets zero-filled)."""
    out: dict = {}
    for mode in ("IGNORED", "REQUIRED"):
        rows = {r["bucket"]: r for r in aggregate_results(cases, mode).collect()}
        table = {}
        for bucket in MENTION_BUCKETS:
            r = rows.get(bucket)
            table[bucket] = {
                "true_positives": int(r["tp"]) if r else 0,
                "false_positives": int(r["fp"]) if r else 0,
                "false_negatives": int(r["fn"]) if r else 0,
                "ground_truth": int(r["ground_truth"]) if r else 0,
                "precision": float(r["precision"]) if r else 0.0,
                "recall": float(r["recall"]) if r else 0.0,
                "f1": float(r["f1"]) if r else 0.0,
            }
        out[mode] = {"mention_types": table}
    return out
