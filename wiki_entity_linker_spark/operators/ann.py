"""Similarity search over embedding columns.

* :func:`cosine_topk` — brute-force cosine top-k (correct baseline; cross
  join + window, all JVM-side).
* :func:`rhp_lsh_buckets` / :func:`lsh_topk` — the scale path: random-
  hyperplane LSH sign buckets (planes drawn from a seeded numpy RNG on the
  driver, embedded as literal arrays → deterministic, no UDF), candidates
  searched only within matching buckets (optionally multi-probe via several
  independent tables).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wiki_entity_linker_spark.functions.vectors import cosine, dot


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """→ ``(query_id, vec_id, cos, rank)`` — exact top-k per query.

    Broadcast the query side (queries ≪ corpus at scale); ties broken by
    ascending corpus id for determinism (the reference's sorted-qid
    tie-break, prefix_trie_linker.py:254-255).
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
    )
    v = vectors.select(F.col(id_col), F.col(vec_col).alias("vv"))
    # Rank by the RAW cosine (rounding only in the output projection) so
    # top-k membership matches an oracle that orders by the unrounded value;
    # ranking the rounded score can flip neighbors within 1e-6 across engines.
    scored = v.crossJoin(F.broadcast(q)).select(
        "query_id", id_col, cosine("qv", "vv").alias("__cos_raw")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos_raw").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("__cos_raw", 6).alias("cos"), "rank")
    )


def _plane_literals(dim: int, n_planes: int, seed: int) -> list:
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim))
    return [
        F.array(*[F.lit(float(x)) for x in plane]) for plane in planes
    ]


def rhp_lsh_buckets(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
    table: int = 0,
) -> DataFrame:
    """→ ``(id, bucket)`` — sign pattern of ``n_planes`` random projections."""
    bucket = None
    for i, plane in enumerate(_plane_literals(dim, n_planes, seed * 1000 + table)):
        bit = F.when(dot(F.col(vec_col), plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return df.select(
        F.col(id_col),
        F.concat(F.lit(f"t{table}:"), bucket.cast("string")).alias("bucket"),
    )


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: union of ``n_tables`` independent LSH tables;
    exact cosine re-rank within candidate buckets only."""
    cand = None
    for t in range(n_tables):
        vb = rhp_lsh_buckets(vectors, dim, id_col, vec_col, n_planes, seed, t)
        qb = rhp_lsh_buckets(
            queries, dim, query_id_col, query_vec_col, n_planes, seed, t
        ).withColumnRenamed(query_id_col, "query_id")
        c = vb.join(qb, "bucket").select("query_id", id_col)
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.dropDuplicates(["query_id", id_col])
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
    )
    v = vectors.select(F.col(id_col), F.col(vec_col).alias("vv"))
    scored = (
        cand.join(v, id_col)
        .join(F.broadcast(q), "query_id")
        .select("query_id", id_col, cosine("qv", "vv").alias("__cos_raw"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos_raw").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("__cos_raw", 6).alias("cos"), "rank")
    )
