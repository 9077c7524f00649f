"""BM25 keyword retrieval over a document corpus.

Training-data-pipeline addition (build brief): keyword search is the
retrieval half of decontamination-by-retrieval and of targeted corpus
curation ("pull every doc about X for re-weighting"). The reference's query
surface is entity-centric (SURVEY.md §2), so this is a rebuild extension,
not a parity item.

Scale shape (100 TB reading):

* the query-term table is a handful of rows → BROADCAST into the token
  stream; only matching tokens survive the join, so the per-(doc, term)
  ``tf`` aggregation shuffles the MATCHING subset, never the corpus;
* ``df`` (per-term doc frequency) aggregates the already-tiny tf table;
* corpus stats (N, avgdl) are a 1-row aggregate, cross-joined broadcast;
* the final top-k is a row_number over candidate docs only — documents
  containing at least one query term. For a pathological stopword query
  that is corpus-sized; pre-aggregate per-partition top-k before the global
  window if that is your workload (same two-level shape as
  operators/packing.global_prefix_sum).

Determinism note: per-term weights are scaled to int64 (×1e9, rounded)
BEFORE the per-doc sum, so the score is an order-independent integer sum —
float addition order across partitions can't wiggle the last ulp, and the
DuckDB oracle (queries.bm25_topk) reproduces it bit-for-bit. Arithmetic is
parenthesized identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wiki_entity_linker_spark.functions.text import tokenize


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query under BM25
    (Robertson/Spärck Jones; the ATIRE ``ln(1 + (N - df + .5)/(df + .5))``
    idf variant, which is nonnegative by construction).

    Returns ``(doc_id, score, rank)`` — ties broken by ``doc_id``.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    # One tokenize pass, one combinable groupBy: per-doc dl AND per-term tf
    # come from conditional aggregates over the exploded stream (the old
    # shape tokenized twice — dl pass + term-join pass — and re-aggregated
    # term rows per doc). df per term is then a count over the per-doc
    # summary, and the score is row-local against a 1-row broadcast. Scores
    # are bit-identical: each per-term contribution is the same rounded
    # int64, a term absent from a doc contributes exactly 0 (tf = 0 zeroes
    # the numerator), and int64 sums are order-independent; docs containing
    # no query term are filtered out, as the old term-join implied.
    toks = docs.select(id_col, F.explode(tokenize(text_col)).alias("token"))
    perdoc = toks.groupBy(id_col).agg(
        F.count("*").alias("dl"),
        *[
            F.sum(F.when(F.col("token") == t, 1).otherwise(0))
            .cast("long")
            .alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = perdoc.agg(
        F.count("*").alias("n_docs"),
        # explicit exact-int-sum / count, NOT avg(): both engines then derive
        # avgdl from the identical integer pair
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    one_minus_b = 1.0 - b

    def w9(i: int):
        tf, df = F.col(f"tf{i}"), F.col(f"df{i}")
        return F.round(
            (
                F.log(F.lit(1.0) + (F.col("n_docs") - df + 0.5) / (df + 0.5))
                * (
                    (tf * (k1 + 1.0))
                    / (tf + k1 * (one_minus_b + b * (F.col("dl") / F.col("avgdl"))))
                )
            )
            * 1e9
        ).cast("long")

    s9 = w9(0)
    for i in range(1, len(terms)):
        s9 = s9 + w9(i)
    any_term = F.greatest(*[F.col(f"tf{i}") for i in range(len(terms))]) \
        if len(terms) > 1 else F.col("tf0")
    scored = (
        perdoc.crossJoin(F.broadcast(stats))
        .filter(any_term > 0)
        .select(id_col, s9.alias("s9"))
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("s9").desc(), F.col(id_col))),
    )
    return ranked.filter(F.col("rank") <= k).select(
        id_col,
        F.round(F.col("s9") / 1e9, 6).alias("score"),
        F.col("rank").cast("int").alias("rank"),
    )
