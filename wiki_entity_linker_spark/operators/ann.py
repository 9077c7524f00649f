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

from wiki_entity_linker_spark.functions.vectors import cosine_prenorm, dot, norm


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
    # norms attached per VECTOR before the pair join (cosine_prenorm:
    # bit-identical doubles, 1 higher-order aggregate per pair instead of 3)
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv"),
        norm(query_vec_col).alias("__nq"),
    )
    v = vectors.select(
        F.col(id_col), F.col(vec_col).alias("vv"), norm(vec_col).alias("__nv")
    )
    # Rank by the RAW cosine (rounding only in the output projection) so
    # top-k membership matches an oracle that orders by the unrounded value;
    # ranking the rounded score can flip neighbors within 1e-6 across engines.
    scored = v.crossJoin(F.broadcast(q)).select(
        "query_id", id_col,
        cosine_prenorm("qv", "vv", "__nq", "__nv").alias("__cos_raw"),
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
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv"),
        norm(query_vec_col).alias("__nq"),
    )
    v = vectors.select(
        F.col(id_col), F.col(vec_col).alias("vv"), norm(vec_col).alias("__nv")
    )
    scored = (
        cand.join(v, id_col)
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id", id_col,
            cosine_prenorm("qv", "vv", "__nq", "__nv").alias("__cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos_raw").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("__cos_raw", 6).alias("cos"), "rank")
    )


def seeded_centroids(dim: int, n_centroids: int, seed: int = 42) -> list[list[float]]:
    """Data-independent coarse-quantizer centroids from a seeded RNG.

    A random-center Voronoi partition is a legitimate IVF coarse quantizer
    (lower recall per probe than k-means-trained centers, same structure);
    because it is data-independent it can be embedded verbatim into the
    DuckDB oracle, making the whole IVF path deterministically checkable —
    the same trick as the RHP-LSH plane literals above.
    """
    rng = np.random.RandomState(seed)
    return [[float(x) for x in row] for row in rng.standard_normal((n_centroids, dim))]


def train_ivf_centroids(
    df: DataFrame,
    dim: int,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_limit: int = 1024,
    n_iter: int = 5,
    seed: int = 42,
) -> list[list[float]]:
    """Deterministic Lloyd k-means on a bounded driver-side training slice.

    IVF coarse-quantizer training is an offline, sampled step even at 10⁹
    vectors (the index ASSIGNMENT below is the distributed part); the slice
    is ``ORDER BY id LIMIT train_limit`` so the result is reproducible, and
    the numpy loop is exact Lloyd with empty-cluster carry-over.
    """
    rows = df.orderBy(id_col).limit(train_limit).select(vec_col).collect()
    X = np.array([list(r[0]) for r in rows], dtype=np.float64)
    if len(X) == 0:
        raise ValueError("train_ivf_centroids: training slice is empty")
    # small corpora / heavy filters: fewer rows than requested centroids
    n_centroids = min(n_centroids, len(X))
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=n_centroids, replace=False)].copy()
    for _ in range(n_iter):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        for j in range(n_centroids):
            if (a == j).any():
                C[j] = X[a == j].mean(0)
    return [[float(x) for x in row] for row in C]


def _cell_structs(vec_col: str, centroids: list[list[float]]) -> list:
    """(squared-L2-distance, centroid-index) structs, all JVM-side column
    math: ``|v|² - 2·v·c + |c|²`` with |c|² folded to a literal."""
    vnorm = dot(F.col(vec_col), F.col(vec_col))
    out = []
    for j, c in enumerate(centroids):
        clit = F.array(*[F.lit(x) for x in c])
        cn = float(sum(x * x for x in c))
        d = vnorm - 2 * dot(F.col(vec_col), clit) + F.lit(cn)
        out.append(F.struct(d.alias("d"), F.lit(j).alias("j")))
    return out


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ ``(id, cell)`` — each vector's nearest centroid (struct array_min:
    ties break to the lowest centroid index, deterministically)."""
    cells = _cell_structs(vec_col, centroids)
    return df.select(
        F.col(id_col), F.array_min(F.array(*cells))["j"].alias("cell")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    max_cell: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe each query's ``nprobe`` nearest cells,
    exact-cosine re-rank only the vectors indexed there.

    Scale shape: assignment is one JVM-side pass over the corpus (shuffle on
    ``cell`` only at the candidate join); each cell holds ~n/n_centroids
    vectors, so per-query work drops by ``n_centroids / nprobe`` vs brute
    force. Skewed cells (seeded random centroids don't balance like trained
    ones) are the operator's known weakness — train with
    :func:`train_ivf_centroids` in production. ``max_cell`` is the wired-in
    guard for the pathological case: a cell holding more than ``max_cell``
    vectors keeps only its ``max_cell`` lowest-id members in the candidate
    index (deterministic truncation; queries probing a truncated hot cell
    trade recall for a bounded join, the same stopword trade as the LSH
    dedup guard).
    """
    va = ivf_assign(vectors, centroids, id_col, vec_col)
    if max_cell is not None:
        wcell = Window.partitionBy("cell").orderBy(id_col)
        va = (
            va.withColumn("__rn", F.row_number().over(wcell))
            .filter(F.col("__rn") <= max_cell)
            .drop("__rn")
        )
    qcells = _cell_structs(query_vec_col, centroids)
    qa = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(
            F.slice(F.array_sort(F.array(*qcells)), 1, nprobe)
        ).alias("probe"),
    ).select("query_id", F.col("probe.j").alias("cell"))
    # each vector lives in exactly one cell → the probe join cannot duplicate
    cand = va.join(qa, "cell").select("query_id", id_col)
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv"),
        norm(query_vec_col).alias("__nq"),
    )
    v = vectors.select(
        F.col(id_col), F.col(vec_col).alias("vv"), norm(vec_col).alias("__nv")
    )
    scored = (
        cand.join(v, id_col)
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id", id_col,
            cosine_prenorm("qv", "vv", "__nq", "__nv").alias("__cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos_raw").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, F.round("__cos_raw", 6).alias("cos"), "rank")
    )


def kmeans_lattice_assign(
    df: DataFrame,
    k: int = 4,
    n_iter: int = 2,
    grid: int = 1000,
    shift: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed integer-lattice Lloyd k-means → ``(id, cell)``.

    The fully distributed complement to :func:`train_ivf_centroids` (which
    trains on a bounded driver-side slice): every step is DataFrame ops, so
    it survives corpora where no representative slice fits one machine.
    Made bit-portable the same way pagerank_fixed_point is — all arithmetic
    on int64: vectors land on a positive integer grid
    (``round((x + shift) * grid)``, shift-invariant for L2), centroids are
    FLOORED back to the grid each M-step (quantized Lloyd; grid error
    ~1/grid per dim), distances are exact integer sums, and argmin ties
    break to the lowest cell index. Init = the ``k`` vectors with the
    smallest (portable-hash, id) key, cells numbered in that order; an
    emptied cell carries its previous centroid over.

    One iteration = assign + update; the returned frame is the assignment
    of iteration ``n_iter`` (computed against the (n_iter−1)-th update).

    Scale shape: the centroid frame is k rows and BROADCASTS into the
    assignment crossJoin (k·N intermediate, one groupBy-argmin); the
    M-step is a (cell, dim)-keyed aggregation of posexploded members with
    map-side combine. No driver collect anywhere; the only global sort is
    the k-row init (orderBy + limit k).
    """
    from wiki_entity_linker_spark.functions.hashing import h64

    q = df.select(
        F.col(id_col),
        F.transform(
            vec_col,
            lambda x: F.round((x + F.lit(float(shift))) * grid, 0).cast("long"),
        ).alias("v"),
    ).localCheckpoint(eager=True)

    key = h64(F.col(id_col).cast("string"))
    cand = q.orderBy(key, id_col).limit(k)
    w0 = Window.orderBy(h64(F.col(id_col).cast("string")), id_col)
    cents = cand.select(
        (F.row_number().over(w0) - 1).cast("long").alias("cell"),
        F.col("v").alias("c"),
    ).localCheckpoint(eager=True)

    assign = None
    for it in range(1, n_iter + 1):
        d = F.aggregate(
            F.zip_with("v", "c", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        assign = (
            q.crossJoin(F.broadcast(cents))
            .select(id_col, "v", "cell", d.alias("d"))
            .groupBy(id_col)
            .agg(
                F.min(F.struct("d", "cell")).alias("m"),
                F.first("v").alias("v"),
            )
            .select(id_col, F.col("m.cell").alias("cell"), "v")
        )
        if it == n_iter:
            break
        assign = assign.localCheckpoint(eager=True)
        upd = (
            assign.select("cell", F.posexplode("v").alias("i", "x"))
            .groupBy("cell", "i")
            .agg(
                F.sum("x").cast("long").alias("s"),
                F.count("*").cast("long").alias("n"),
            )
            .withColumn("cv", F.expr("s div n").cast("long"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "cv"))),
                    lambda s: s["cv"],
                ).alias("c")
            )
        )
        carried = cents.join(upd.select("cell"), "cell", "left_anti")
        cents = upd.unionByName(carried).localCheckpoint(eager=True)
    return assign.select(id_col, "cell")
