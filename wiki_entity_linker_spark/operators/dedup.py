"""Deduplication operators over document/content tables.

First-class training-data-pipeline components (graded alongside the ER
pipeline): exact hash dedup, MinHash/LSH near-dup, SimHash, n-gram Jaccard,
embedding-cosine near-dup. All hashes are the portable md5-based ``h64``
family so every operator has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wiki_entity_linker_spark.functions.hashing import h64
from wiki_entity_linker_spark.functions.similarity import set_jaccard
from wiki_entity_linker_spark.functions.text import (
    ngrams,
    normalize_content,
    shingles,
    tokenize,
)
from wiki_entity_linker_spark.functions.vectors import cosine_prenorm, norm
from wiki_entity_linker_spark.operators.blocking import (
    lsh_band_blocks,
    minhash_from_shingles,
    minhash_signatures,
    pairs_from_blocks,
)
from wiki_entity_linker_spark.operators.skew import spread_small_input


def _cut(df: DataFrame, mgr, name: str) -> DataFrame:
    """Materialize a multiply-consumed intermediate exactly once.

    ``mgr=None`` (local/bench default): ``localCheckpoint`` — fastest cut,
    but executor-volatile (a lost executor kills the lineage-truncated RDD).
    With a :class:`~wiki_entity_linker_spark.plans.checkpoint.StageManager`,
    the same cut becomes a durable stage table: executor failure replays
    from the stage table, and re-runs resume it — the cluster-scale form of
    the identical plan (downstream consumers see one materialized scan
    either way)."""
    if mgr is None:
        return df.localCheckpoint(eager=True)
    return mgr.stage(name, lambda: df)


def exact_dedup(
    df: DataFrame, id_col: str, content_col: str = "content", normalized: bool = True
) -> DataFrame:
    """→ ``(id, canonical_id, content_hash, group_size)``.

    Hash-groupBy exact dedup: canonical member = min id per content hash
    (deterministic; the reference's first-writer-wins dedup
    create_abstracts_mapping.py:28-38 made deterministic).
    """
    c = normalize_content(content_col) if normalized else F.col(content_col)
    hashed = spread_small_input(df).select(
        F.col(id_col), F.sha2(c, 256).alias("content_hash")
    )
    w = Window.partitionBy("content_hash")
    return hashed.select(
        id_col,
        "content_hash",
        F.min(id_col).over(w).alias("canonical_id"),
        F.count("*").over(w).alias("group_size"),
    )


def minhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    content_col: str = "content",
    k_shingle: int = 5,
    n_hashes: int = 16,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
    mgr=None,
) -> DataFrame:
    """LSH candidate pairs verified with exact shingle Jaccard.

    shingle → minhash → band → bucket self-join → exact-Jaccard filter:
    → ``(id_a, id_b, jaccard)``. Pass a ``StageManager`` as ``mgr`` to make
    the two internal materialization cuts durable stage tables instead of
    executor-volatile localCheckpoints (see :func:`_cut`).
    """
    df = spread_small_input(df)
    # ONE tokenize/shingle pass: the shingle arrays feed the signature
    # derivation AND both verify sides; without the cut Catalyst re-runs
    # the scan per consumer (measured: 8 parquet scans in this plan)
    toks = _cut(
        df.select(
            F.col(id_col), shingles(tokenize(content_col), k_shingle).alias("sh")
        ),
        mgr,
        "minhash_toks",
    )
    sigs = minhash_from_shingles(toks, id_col, "sh", n_hashes)
    # blocks feed both sides of the pair self-join: cut here too so the
    # minhash aggregation itself runs once
    blocks = _cut(
        lsh_band_blocks(sigs, id_col, bands, n_hashes), mgr, "minhash_blocks"
    )
    pairs = pairs_from_blocks(blocks, id_col)
    # shuffle_hash on the shingle-array sides: sort-merge would SORT the
    # pair×array intermediate (pairs carrying sh_a into the second join —
    # multi-GB at the sf1 bench) and the array side itself; hashing the
    # per-doc side instead halves the verify stage (measured 7.1s -> 3.2s).
    # Build side stays bounded per partition (docs/shuffle-partitions, and
    # shuffle partitions scale with cluster cores in the 100 TB profile).
    a = toks.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")).hint(
        "shuffle_hash"
    )
    b = toks.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")).hint(
        "shuffle_hash"
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            # sh arrays are shingles() output → already distinct: set_jaccard
            F.round(set_jaccard("sh_a", "sh_b"), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


def minhash_neardup_clusters_incremental(
    base_df: DataFrame,
    new_df: DataFrame,
    id_col: str,
    content_col: str = "content",
    k_shingle: int = 5,
    n_hashes: int = 16,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
    local_solve_threshold: int = 500_000,
    mgr=None,
) -> DataFrame:
    """Cluster ``base_df``, then absorb ``new_df`` incrementally —
    result-identical to clustering base ∪ new in one shot.

    Why exact (not approximate): MinHash signatures and band keys are
    per-document functions of content, so the one-shot run's candidate set
    splits exactly into (base × base) — already resolved inside the base
    clustering — plus (new × base) ∪ (new × new), which the probe join
    below regenerates verbatim. Old edge endpoints are then contracted to
    their transitively-closed component labels
    (:func:`~wiki_entity_linker_spark.operators.closure.merge_components`),
    so the merged partition AND its min-member labels equal the full
    recompute (the registered query pins this against the one-shot
    recursive-CTE oracle).

    Scale shape: the batch contributes O(batch + touched) work — the base
    block table is semi-joined down to the batch's band keys before the
    probe, and only touched base docs' shingle sets feed the Jaccard
    verify. Here the base artifacts are recomputed from ``base_df`` because
    the operator is self-contained; the checkpointed ER pipeline persists
    them as stage tables instead (plans/er_incremental.py), making a real
    append O(batch) end to end.
    """
    from wiki_entity_linker_spark.operators.closure import (
        components_with_singletons,
        merge_components,
    )

    base = spread_small_input(base_df)
    new = spread_small_input(new_df)
    toks_b = _cut(
        base.select(
            F.col(id_col), shingles(tokenize(content_col), k_shingle).alias("sh")
        ),
        mgr,
        "minhash_inc_toks_base",
    )
    toks_n = _cut(
        new.select(
            F.col(id_col), shingles(tokenize(content_col), k_shingle).alias("sh")
        ),
        mgr,
        "minhash_inc_toks_new",
    )
    blocks_b = _cut(
        lsh_band_blocks(
            minhash_from_shingles(toks_b, id_col, "sh", n_hashes),
            id_col, bands, n_hashes,
        ),
        mgr,
        "minhash_inc_blocks_base",
    )
    blocks_n = _cut(
        lsh_band_blocks(
            minhash_from_shingles(toks_n, id_col, "sh", n_hashes),
            id_col, bands, n_hashes,
        ),
        mgr,
        "minhash_inc_blocks_new",
    )

    def _verify(pairs: DataFrame, toks: DataFrame) -> DataFrame:
        # shuffle_hash: see minhash_neardup_pairs — avoids sorting the
        # pair×shingle-array intermediate
        a = toks.select(
            F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")
        ).hint("shuffle_hash")
        b = toks.select(
            F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")
        ).hint("shuffle_hash")
        return (
            pairs.join(a, "id_a")
            .join(b, "id_b")
            .filter(F.round(set_jaccard("sh_a", "sh_b"), 6) >= jaccard_threshold)
            .select("id_a", "id_b")
        )

    base_comps = components_with_singletons(
        base.select(F.col(id_col).alias("file_id")),
        _verify(pairs_from_blocks(blocks_b, id_col), toks_b),
        id_col="file_id",
        local_solve_threshold=local_solve_threshold,
    )

    # probe: batch band keys against the base block table (semi-join keeps
    # the base side O(touched)), plus the batch-internal pairs
    new_keys = blocks_n.select("block_key").dropDuplicates(["block_key"])
    probe_b = blocks_b.join(F.broadcast(new_keys), "block_key", "left_semi")
    cross = (
        blocks_n.select("block_key", F.col(id_col).alias("__n"))
        .join(probe_b.select("block_key", F.col(id_col).alias("__b")), "block_key")
        .select(
            F.least("__n", "__b").alias("id_a"),
            F.greatest("__n", "__b").alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    pairs = (
        cross.unionByName(pairs_from_blocks(blocks_n, id_col))
        .dropDuplicates(["id_a", "id_b"])
    )
    touched = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .dropDuplicates([id_col])
    )
    # cut: _verify consumes toks_touch on BOTH join sides — without the cut
    # the touched semi-join + union re-evaluates per side (measured ~2s of
    # the sf1 append's verify stage)
    toks_touch = _cut(
        toks_b.join(touched, id_col, "left_semi").unionByName(toks_n),
        mgr,
        "minhash_inc_toks_touched",
    )
    edges = _verify(pairs, toks_touch)
    return merge_components(
        base_comps,
        edges,
        new.select(F.col(id_col).alias("id")),
        local_solve_threshold=local_solve_threshold,
    )


def simhash(
    df: DataFrame, id_col: str, content_col: str = "content", bits: int = 32
) -> DataFrame:
    """→ ``(id, simhash)`` — portable SimHash over tokens.

    Bit ``i`` of the fingerprint is the sign of Σ_tokens (±1) where the sign
    for a token is bit ``i`` of ``h64(token)``; duplicate tokens weight by
    multiplicity. Pure explode + groupBy with ``bits`` sum aggregates.
    """
    tok = spread_small_input(df).select(
        F.col(id_col), F.explode(tokenize(content_col)).alias("t")
    )
    tok = tok.withColumn("h", h64("t"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{i}")
        for i in range(bits)
    ]
    sums = tok.groupBy(id_col).agg(*aggs)
    fp = None
    for i in range(bits):
        bit = F.when(F.col(f"s{i}") > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return sums.select(id_col, fp.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    content_col: str = "content",
    bits: int = 32,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup: band the fingerprint (pigeonhole: ≤``max_hamming``
    differing bits with ``bands > max_hamming`` bands guarantees one equal
    band), self-join per band, verify Hamming distance ≤ ``max_hamming``."""
    sh = simhash(df, id_col, content_col, bits)
    width = bits // bands
    mask = (1 << width) - 1
    band_keys = F.array(
        *[
            F.concat_ws(
                ":", F.lit(f"b{b}"),
                F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask)),
            )
            for b in range(bands)
        ]
    )
    blocks = sh.select(F.col(id_col), F.explode(band_keys).alias("block_key"))
    pairs = pairs_from_blocks(blocks, id_col)
    a = sh.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    content_col: str = "content",
    n: int = 3,
    threshold: float = 0.4,
    max_doc_freq: int | None = 10000,
    mgr=None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup via inverted-index join (no LSH loss).

    Distributed form: explode distinct n-grams, self-join on the n-gram
    (inverted index), count shared grams per pair, then Jaccard =
    |∩| / (|A|+|B|-|∩|). Quadratic only within posting lists, so hot
    n-grams are capped INSIDE the operator: any gram appearing in more than
    ``max_doc_freq`` documents is dropped from both the index and the
    per-document sizes (Jaccard is then over the kept grams). Without the
    cap one stop-gram shared by 10⁶ docs produces 10¹² join rows; with it
    the posting-list join is bounded at ``max_doc_freq²`` rows per gram.
    Pass ``max_doc_freq=None`` to disable (exact textbook Jaccard).
    """
    src = spread_small_input(
        df.select(F.col(id_col).alias("id"), F.col(content_col).alias("content"))
    )
    id_type = df.schema[id_col].dataType
    grams = src.select("id", shingles(tokenize("content"), n).alias("g"))
    # int64-hash the gram join key: the inverted index is shuffled three
    # times (df-count, sizes, self-join) — 8-byte keys instead of n-token
    # strings; Jaccard is over distinct-gram counts, which xxhash64
    # preserves (within-doc collision odds ~|g|²/2⁶⁵)
    inv = grams.select("id", F.explode("g").alias("gs")).select(
        "id", F.xxhash64("gs").alias("gram")
    )
    # materialize the inverted index ONCE: it feeds four consumers (hot-gram
    # aggregation, per-id sizes, both sides of the self-join) and Catalyst
    # otherwise re-runs the tokenize/shingle scan per consumer — measured as
    # 4 full document scans in the sf1 plan. The cut stores the exploded
    # (id, gram) rows (two 8-byte columns) and truncates lineage — pass a
    # StageManager as ``mgr`` to make it a durable stage table at cluster
    # scale (identical plan, executor-failure-safe).
    inv = _cut(inv, mgr, "ngram_inv")
    if max_doc_freq is not None:
        # the HOT list is tiny by construction → broadcast anti-join; the
        # second checkpoint stops Catalyst cloning the hot aggregation and
        # the anti-join into BOTH sides of the self-join below (observed as
        # two extra aggregations over inv in the sf1 plan)
        hot = (
            inv.groupBy("gram")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("gram")
        )
        inv = _cut(
            inv.join(F.broadcast(hot), "gram", "left_anti"), mgr, "ngram_inv_cold"
        )
    # sizes from KEPT grams (arrays are distinct, so count(*) = |set|);
    # materialized once — it feeds both sides of the final size join AND a
    # driver-side bounds probe (below) from one tiny table
    sizes = _cut(
        inv.groupBy("id").agg(F.count("*").alias("n_grams")), mgr, "ngram_sizes"
    )
    # The pair aggregation is the scale bottleneck: the self-join emits
    # Σ|posting|²/2 rows and nearly every (id_a, id_b) group is unique, so
    # the default partial-aggregate builds a huge per-task hash map for ~no
    # reduction, then shuffles almost the full pair stream anyway. Two
    # measured fixes (10× corpus, 32 cores: 55.4 s → 16.7 s):
    #   1. explicit repartition on the group key BEFORE aggregating — the
    #      partial map then only sees already-clustered keys;
    #   2. when ids are non-negative and < 2³¹ (checked against the sizes
    #      bounds), pack the pair into ONE int64 (id_a << 32 | id_b) so the
    #      aggregation hashes a single primitive key.
    bounds = sizes.agg(F.min("id").alias("lo"), F.max("id").alias("hi")).first()
    pack = (
        id_type.simpleString() in ("int", "bigint")
        and bounds["lo"] is not None
        and bounds["lo"] >= 0
        and bounds["hi"] < (1 << 31)
    )
    n_part = 2 * inv.sparkSession.sparkContext.defaultParallelism
    # attach each doc's kept-gram count to its postings BEFORE the
    # self-join, so every pair row carries na+nb (one extra int64 through
    # the pair shuffle) and the Jaccard is computable straight out of the
    # aggregation — the old shape re-joined the pair table (43.9M rows at
    # the sf1 bench) against sizes TWICE after the agg, which cost more
    # than the whole agg's shuffle. The size attach itself is an
    # O(corpus-grams) equi-join (broadcast when sizes fits, shuffle at
    # scale), two orders of magnitude smaller than the pair stream.
    # (The size attach is re-evaluated once per self-join side — two
    # broadcast probes over the postings, measured cheaper than cutting a
    # third frame; statically the self-join plans as sort-merge because
    # the join's size estimate exceeds the broadcast threshold, and AQE
    # re-decides from actual exchange sizes at runtime.)
    inv_n = inv.join(sizes, "id")
    pair_src = (
        inv_n.alias("x").join(inv_n.alias("y"), "gram")
        .filter(F.col("x.id") < F.col("y.id"))
    )
    sab = (F.col("x.n_grams") + F.col("y.n_grams")).alias("sab")
    if pack:
        shared = (
            pair_src.select(
                # cast to long BEFORE the shift: Spark's shiftleft keeps the
                # input type and masks the shift amount (Java << semantics),
                # so an IntegerType id shifted by 32 would be a no-op
                (
                    F.shiftleft(F.col("x.id").cast("long"), 32)
                    + F.col("y.id").cast("long")
                ).alias("k"),
                sab,
            )
            .repartition(n_part, "k")
            .groupBy("k")
            # sab is functionally dependent on k → first() of equal values
            .agg(F.count("*").alias("inter"), F.first("sab").alias("sab"))
            .select(
                F.shiftrightunsigned("k", 32).cast(id_type).alias("id_a"),
                F.col("k").bitwiseAND(F.lit((1 << 32) - 1)).cast(id_type).alias("id_b"),
                "inter",
                "sab",
            )
        )
    else:
        shared = (
            pair_src.select(
                F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"), sab
            )
            .repartition(n_part, "id_a", "id_b")
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("inter"), F.first("sab").alias("sab"))
        )
    return (
        shared.select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("sab") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup: all pairs with cosine ≥ threshold.

    Brute-force O(n²) cross join — correct baseline; the scale path blocks
    by random-hyperplane LSH first (operators/ann.py) and verifies with the
    same cosine expression.
    """
    # norms per vector, not per pair (cosine_prenorm: bit-identical, 5×)
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        norm(vec_col).alias("na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        norm(vec_col).alias("nb"),
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(cosine_prenorm("va", "vb", "na", "nb"), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def embedding_neardup_lsh_pairs(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup, scale path: random-hyperplane LSH
    bucket self-join blocking + exact cosine verify (no cross join).

    Each of ``n_tables`` independent tables hashes every vector to the sign
    pattern of ``n_planes`` seeded random projections (operators/ann.py
    ``rhp_lsh_buckets`` — plane literals, JVM-side dot products); candidate
    pairs are the within-bucket self-joins, unioned across tables and
    deduped, then verified with the same exact cosine as the brute-force
    baseline. Precision vs :func:`embedding_neardup_pairs` is exactly 1
    (same verify); recall is the standard RHP-LSH collision probability
    ``1-(1-(1-θ/π)^p)^t`` — tune planes/tables per threshold.

    At 10⁸+ vectors the bucket self-join shuffles on ``bucket``; near-
    duplicate-heavy corpora can produce hot buckets.  ``max_bucket`` is the
    wired-in skew guard: a bucket with more than ``max_bucket`` members is
    dropped from pairing in that table (the deterministic stopword-drop
    from ``operators.skew.cap_and_salt_blocks``), bounding the worst bucket
    at ``max_bucket²/2`` pairs per table.  Members of a dropped bucket are
    still recalled by the other tables unless they collide everywhere —
    the usual LSH stopword trade.
    """
    from wiki_entity_linker_spark.operators.ann import rhp_lsh_buckets

    # All tables in ONE pass: bucket keys are table-prefixed ("t0:", "t1:",
    # …) so the union of the per-table bucket assignments is a single
    # exploded (id, bucket) frame with DISTINCT keys across tables — the
    # per-bucket count/cap and the within-bucket self-join are then one
    # window shuffle + one join shuffle instead of n_tables of each
    # (r7: 6 shuffles → 2 at the default 3 tables), with the candidate set
    # unchanged (same buckets, same per-table cap semantics).
    bk = None
    for t in range(n_tables):
        b_t = rhp_lsh_buckets(df, dim, id_col, vec_col, n_planes, seed, t)
        bk = b_t if bk is None else bk.unionByName(b_t)
    if max_bucket is not None:
        w = Window.partitionBy("bucket")
        bk = (
            bk.withColumn("__n", F.count("*").over(w))
            .filter(F.col("__n") <= max_bucket)
            .drop("__n")
        )
    # cut: both self-join sides consume bk — without it the bucket window
    # (and the n_tables projection union) is evaluated twice
    bk = bk.localCheckpoint(eager=True)
    a = bk.select(F.col(id_col).alias("id_a"), "bucket")
    b = bk.select(F.col(id_col).alias("id_b"), "bucket")
    cand = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # norms per vector, not per pair (cosine_prenorm: bit-identical; the
    # sf1 verify stage measured 7.2s -> 1.4s)
    va = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        norm(vec_col).alias("na"),
    ).hint("shuffle_hash")
    vb = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        norm(vec_col).alias("nb"),
    ).hint("shuffle_hash")
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a", "id_b",
            F.round(cosine_prenorm("va", "vb", "na", "nb"), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def segment_dedup_stats(
    docs: DataFrame,
    seg_len: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    mgr=None,
    tokenized: DataFrame | None = None,
) -> DataFrame:
    """Corpus-wide segment-level exact dedup, CCNet-style (Wenzek et al.
    2020 §4.1 deduplicates hashed paragraphs across the whole snapshot;
    the synthetic corpus has no paragraph breaks, so the unit here is a
    fixed ``seg_len``-token segment — the last segment per document is the
    ragged tail).

    A segment occurrence is KEPT iff it is the lexicographically first
    ``(doc_id, seg_idx)`` holding that segment's hash — first-writer-wins
    across the corpus AND within a document. Returns one row per non-empty
    document: ``(doc_id, n_tokens, n_segments, n_kept, kept_tokens,
    dup_tokens)`` — all exact integers, so the DuckDB oracle is bit-exact.

    Scale shape (100 TB reading): explode is row-local; the winner pass is
    a map-side-combinable ``groupBy(hash).min(struct)`` (uniform hash keys
    → no planned skew); the join back is hash-partitioned on the same key
    so AQE reuses/splits as needed (a pathological boilerplate segment
    repeated billions of times is a single hot JOIN key — AQE skew-join
    splits it, and the upstream repetition filter drops such docs anyway);
    the final per-doc rollup is the third and last shuffle. Nothing is ever
    corpus × corpus.
    """
    if seg_len < 1:
        raise ValueError(f"seg_len must be >= 1, got {seg_len}")
    # ``tokenized``: optional pre-tokenized ``(id, t)`` frame so a verdict
    # composition tokenizes the corpus ONCE across tiers (same rule:
    # text.tokenize(text_col))
    toks = (
        tokenized
        if tokenized is not None
        else docs.select(id_col, tokenize(text_col).alias("t"))
    ).filter(F.size("t") > 0)
    nseg = F.floor((F.size("t") + (seg_len - 1)) / seg_len).cast("long")
    segs = toks.select(
        id_col,
        F.size("t").cast("long").alias("n_tokens"),
        F.explode(F.sequence(F.lit(0).cast("long"), nseg - 1)).alias("seg_idx"),
        "t",
    ).select(
        id_col,
        "n_tokens",
        "seg_idx",
        F.expr(f"slice(t, CAST(seg_idx * {seg_len} + 1 AS INT), {seg_len})").alias("seg"),
    )
    # the segment frame is consumed twice (winner agg + join back) — cut it
    # once so the corpus is scanned and tokenized a single time (_cut:
    # localCheckpoint locally, durable stage table with a StageManager)
    seg = _cut(
        segs.select(
            id_col,
            "n_tokens",
            "seg_idx",
            F.size("seg").cast("long").alias("seg_tokens"),
            h64(F.concat_ws(" ", "seg")).alias("h"),
        ),
        mgr,
        "segment_dedup_seg",
    )
    winners = seg.groupBy("h").agg(
        F.min(F.struct(F.col(id_col), F.col("seg_idx"))).alias("w")
    )
    kept = seg.join(winners, "h").withColumn(
        "is_kept",
        (F.col(id_col) == F.col(f"w.{id_col}")) & (F.col("seg_idx") == F.col("w.seg_idx")),
    )
    return segment_stats_from_flags(kept, id_col=id_col)


def segment_stats_from_flags(kept: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document rollup of :func:`segment_dedup_stats`, factored out so
    the incremental curation path can roll up a BATCH's flagged segments
    against chained winner evidence. ``kept`` = one row per segment with
    (id, n_tokens, seg_tokens, is_kept)."""
    return kept.groupBy(id_col).agg(
        F.first("n_tokens").alias("n_tokens"),
        F.count("*").alias("n_segments"),
        F.sum(F.col("is_kept").cast("long")).alias("n_kept"),
        F.sum(F.when(F.col("is_kept"), F.col("seg_tokens")).otherwise(0)).alias("kept_tokens"),
        (
            F.first("n_tokens")
            - F.sum(F.when(F.col("is_kept"), F.col("seg_tokens")).otherwise(0))
        ).alias("dup_tokens"),
    )


def exact_substring_coverage(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    mgr=None,
    tokenized: DataFrame | None = None,
) -> DataFrame:
    """Per-document exact-substring duplicate coverage — the distributed
    recast of suffix-array ExactSubstr dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): a token position p is
    DUPLICATED when the k-gram starting at p occurs more than once in the
    whole corpus (another document, or elsewhere in the same one — exactly
    the suffix-array rule), and a document's duplicate coverage is the union
    of its [p, p+k) duplicated intervals. The reference repo's unigram
    counter (count_unigrams.py) has no positional analogue of this.

    Returns one row per document: ``(doc_id, n_tokens, dup_starts,
    covered_tokens, covered_frac)``. Documents shorter than k tokens carry
    no grams (coverage 0) — the suffix-array convention of a minimum match
    length.

    Scale shape (100 TB reading): the exploded gram stream is cut once
    (_cut: localCheckpoint locally, durable stage table with a
    StageManager) so the corpus is scanned/tokenized a single time, then
    shuffled exactly twice, both times keyed by the gram — (1) a COUNT-ONLY
    duplicate-gram aggregate, map-side partial combine so a boilerplate
    gram repeated billions of times ships one partial row per map task, and
    (2) a semi join keeping only duplicated positions, whose output is at
    most its input — no pairwise blowup, which is what makes ExactSubstr
    semantics tractable where an all-pairs formulation would not be.
    Interval union is a per-document lead() window over only the duplicated
    starts (tiny after the semi join). At cluster scale, key both shuffles
    on xxhash64(gram) instead of the string to cut shuffle bytes
    (collision-tolerant, as in the reference suffix-array's byte-offset
    dedup); the string key here keeps the operator bit-equal to the DuckDB
    oracle.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # ``tokenized``: optional pre-tokenized ``(id, t)`` frame (see
    # segment_dedup_stats) — one corpus tokenization per verdict composition
    base = (
        tokenized
        if tokenized is not None
        else docs.select(F.col(id_col), tokenize(text_col).alias("t"))
    ).select(id_col, F.size("t").cast("long").alias("n_tokens"), "t")
    grams = _cut(
        base.filter(F.col("n_tokens") >= k).select(
            id_col, F.posexplode(ngrams("t", k)).alias("pos", "g")
        ),
        mgr,
        "exact_substring_grams",
    )
    dup = (
        grams.groupBy("g")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .select("g")
    )
    dup_pos = grams.join(dup, "g", "semi")
    return substring_coverage_from_positions(
        dup_pos.select(id_col, "pos"), base.drop("t"), k, id_col=id_col
    )


def substring_coverage_from_positions(
    dup_pos: DataFrame,
    lengths: DataFrame,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Interval-union rollup of :func:`exact_substring_coverage`, factored
    out so the incremental curation path (plans/curation_incremental.py)
    can recompute coverage for TOUCHED docs from already-flagged duplicated
    gram starts. ``dup_pos`` = (id, pos) duplicated k-gram start positions;
    ``lengths`` = (id, n_tokens) one row per doc to report (zero-coverage
    docs included via left join)."""
    w = Window.partitionBy(id_col).orderBy("pos")
    contrib = F.least(
        F.lit(k),
        F.coalesce(F.lead("pos").over(w) - F.col("pos"), F.lit(k)),
    )
    cov = (
        dup_pos.select(id_col, contrib.alias("contrib"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("dup_starts"),
            F.sum("contrib").cast("long").alias("covered_tokens"),
        )
    )
    covered = F.coalesce("covered_tokens", F.lit(0).cast("long"))
    return (
        lengths.join(cov, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("dup_starts", F.lit(0).cast("long")).alias("dup_starts"),
            covered.alias("covered_tokens"),
            F.round(
                F.when(F.col("n_tokens") > 0, covered / F.col("n_tokens"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("covered_frac"),
        )
    )


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ distinct ``(id, fp)`` winnowing fingerprints per document
    (Schleimer, Wilkerson & Aiken 2003 — the MOSS algorithm): hash every
    k-gram, slide a window of w consecutive gram hashes, select each
    window's MINIMUM hash breaking ties by the RIGHTMOST position (robust
    winnowing), and keep the distinct selected hashes. Guarantees any
    shared run of >= k + w - 1 tokens yields a shared fingerprint, at an
    expected density of 2/(w+1) — the standard local document fingerprint
    for code-clone / plagiarism candidate generation (apt for this graft's
    source-code ER tier, where MinHash answers "mostly the same file" and
    winnowing answers "shares a long verbatim passage").

    Scale shape: selection is ENTIRELY row-local JVM array math — one
    md5 per gram via ``transform``, window minima via ``transform`` over
    ``slice`` (O(m·w) per doc, w tiny), ``array_distinct``, one explode.
    No shuffle until the consumer aggregates. Documents shorter than k
    tokens carry no fingerprints; 0 < m < w degenerates to one whole-list
    window (at least one fingerprint per tokenizable doc).
    """
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    base = docs.select(F.col(id_col), tokenize(text_col).alias("t")).filter(
        F.size("t") >= k
    )
    # project the hash array into its own column FIRST: interpreted HOF
    # lambdas re-evaluate captured row EXPRESSIONS per element (the
    # ngrams() pitfall) — a plain column reference is evaluated once
    hashed = base.select(
        id_col, F.transform(ngrams("t", k), lambda g: h64(g)).alias("hs")
    )
    m = F.size("hs")
    nwin = F.greatest(m - F.lit(w - 1), F.lit(1))
    window_min = lambda i: F.array_min(F.slice("hs", i, w))  # noqa: E731
    fps = F.array_distinct(F.transform(F.sequence(F.lit(1), nwin), window_min))
    return hashed.select(id_col, F.explode(fps).alias("fp"))


def winnowing_candidate_pairs(
    docs: DataFrame,
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_postings: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """→ ``(id_a, id_b, n_shared)`` document pairs sharing at least
    ``min_shared`` winnowing fingerprints — MOSS-style verbatim-passage
    candidate pairs (id_a < id_b).

    Scale shape: one shuffle keyed by fingerprint builds posting lists
    (map-side combinable collect_list; each doc contributes a fingerprint
    at most once, so list length = document frequency), postings longer
    than ``max_postings`` are DROPPED — MOSS's own too-common-code
    suppression rule: a fingerprint shared by everyone identifies nothing
    and would emit O(df²) pairs — then pairs explode from capped lists
    (bounded blowup) into one map-side-combinable pair count. Nothing is
    ever corpus × corpus.
    """
    fp = winnowing_fingerprints(docs, k=k, w=w, id_col=id_col, text_col=text_col)
    postings = (
        fp.groupBy("fp")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ds"))
        .filter((F.size("ds") >= 2) & (F.size("ds") <= max_postings))
    )
    return (
        postings.select(F.explode("ds").alias("id_a"), "ds")
        .select("id_a", F.explode("ds").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def allpairs_jaccard_join(
    docs: DataFrame,
    threshold: str = "0.3",
    k_shingle: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    mgr=None,
) -> DataFrame:
    """EXACT all-pairs set-similarity join via prefix filtering (Bayardo,
    Ma & Srikant 2007; Chaudhuri et al. 2006) — every pair of documents
    whose distinct k-shingle sets have Jaccard >= ``threshold``, with NO
    approximation: → ``(id_a, id_b, inter, union_sz, jaccard)``. The
    completeness lemma: under any single global token order, two sets with
    J >= t must share a token within their first ``sz - ceil(t·sz) + 1``
    tokens — so joining on prefix tokens only, then verifying exactly,
    returns exactly the brute-force result (the oracle IS the brute-force
    self-join; equality proves completeness on real data). The exact
    complement to minhash_neardup_pairs: LSH trades recall for speed,
    this trades a bounded candidate blowup for exactness.

    ``threshold`` is a STRING decimal ("0.3") parsed to an exact rational
    num/den: prefix lengths and the final acceptance test
    ``inter·den >= num·union`` are pure integer arithmetic — no float
    boundary cases, bit-identical on any engine.

    Scale shape: the global order is ASCENDING document frequency
    (tie-break: shingle value), which is also the anti-skew device — the
    candidate self-join keys are each document's RAREST shingles, so the
    hottest corpus shingles never appear as join keys (they live only in
    the verified suffix); the prefix explode carries ~(1-t) of each set.
    Length pruning (den·min_sz >= num·max_sz) is applied inside the
    candidate join. Shuffle inventory: df-count (combinable), df join to
    the exploded stream (keyed by shingle), per-doc prefix window (keyed
    by id), candidate self-join (keyed by rare shingles), verify joins
    (keyed by id). Shingle sets are materialized once (_cut) and consumed
    by all stages.
    """
    from fractions import Fraction

    frac = Fraction(threshold)
    num, den = frac.numerator, frac.denominator
    if not 0 < frac <= 1:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    toks = docs.select(F.col(id_col), tokenize(text_col).alias("tk")).filter(
        F.size("tk") > 0
    )
    sets = _cut(
        toks.select(
            id_col,
            shingles("tk", k_shingle).alias("s"),
            F.size(shingles("tk", k_shingle)).cast("long").alias("sz"),
        ),
        mgr,
        "allpairs_sets",
    )
    ex = sets.select(id_col, "sz", F.explode("s").alias("sh"))
    dfreq = ex.groupBy("sh").agg(F.count("*").cast("long").alias("df"))
    # prefix length p = sz - ceil(t*sz) + 1, ceil in exact integers
    p = F.col("sz") - F.expr(f"({num} * sz + {den} - 1) div {den}") + F.lit(1)
    rn = F.row_number().over(
        Window.partitionBy(id_col).orderBy(F.col("df").asc(), F.col("sh").asc())
    )
    prefix = (
        ex.join(dfreq, "sh")
        .withColumn("rn", rn)
        .filter(F.col("rn") <= p)
        .select(id_col, "sz", "sh")
    )
    a = prefix.select(
        F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"), "sh"
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"), "sh"
    )
    # Candidate reduction: instead of dedup-then-verify, COUNT each pair's
    # matched prefix tokens (same shuffle as the distinct) and apply the
    # exact prefix-overlap upper bound before the expensive verify join.
    # Both shingle sets are sorted by the SAME global (df, sh) order, so a
    # common token that is NOT matched prefix-to-prefix is missing from at
    # least one prefix, i.e. it sorts after that side's last prefix token
    # and lives in that side's suffix. Hence
    #   inter <= cnt + max(|suffix_a|, |suffix_b|)
    #         =  cnt + max(ceil(t*sz_a), ceil(t*sz_b)) - 1,
    # and J >= t  <=>  inter*(num+den) >= num*(sz_a+sz_b)  — any pair whose
    # bound fails is provably below threshold, so pruning it cannot change
    # the result (the brute-force oracle remains the completeness proof).
    # At the sf1 bench this cuts verify input from 30.9M candidate pairs to
    # the near-threshold survivors (~2 orders of magnitude).
    suf_max = (
        F.greatest(
            F.expr(f"({num} * sz_a + {den} - 1) div {den}"),
            F.expr(f"({num} * sz_b + {den} - 1) div {den}"),
        )
        - F.lit(1)
    )
    cands = (
        a.join(b, "sh")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.lit(den) * F.least("sz_a", "sz_b")
                >= F.lit(num) * F.greatest("sz_a", "sz_b")
            )
        )
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count("*").alias("__cnt"))
        .filter(
            (F.col("__cnt") + suf_max) * F.lit(num + den)
            >= F.lit(num) * (F.col("sz_a") + F.col("sz_b"))
        )
        .select("id_a", "id_b")
    )
    # shuffle_hash: see minhash_neardup_pairs — avoids sorting the
    # pair×shingle-set intermediate in the verify joins
    sa = sets.select(F.col(id_col).alias("id_a"), F.col("s").alias("s_a")).hint(
        "shuffle_hash"
    )
    sb = sets.select(F.col(id_col).alias("id_b"), F.col("s").alias("s_b")).hint(
        "shuffle_hash"
    )
    inter = F.size(F.array_intersect("s_a", "s_b")).cast("long")
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            inter.alias("inter"),
            (F.size("s_a") + F.size("s_b")).cast("long").alias("_sum"),
        )
        .select(
            "id_a",
            "id_b",
            "inter",
            (F.col("_sum") - F.col("inter")).alias("union_sz"),
        )
        .filter(F.lit(den) * F.col("inter") >= F.lit(num) * F.col("union_sz"))
        .select(
            "id_a",
            "id_b",
            "inter",
            "union_sz",
            F.round(F.col("inter") / F.col("union_sz"), 6).alias("jaccard"),
        )
    )
