"""Dedup / similarity-search operators on the fixture corpus and synthetic
vectors."""

import numpy as np
from pyspark.sql import functions as F

from wiki_entity_linker_spark.operators.ann import cosine_topk, lsh_topk
from wiki_entity_linker_spark.operators.blocking import with_file_id
from wiki_entity_linker_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_neardup_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_neardup_pairs,
)


def test_exact_dedup_groups(spark):
    df = spark.createDataFrame(
        [("a", "Hello  World"), ("b", "hello world"), ("c", "different")],
        "id string, content string",
    )
    out = {r["id"]: (r["canonical_id"], r["group_size"])
           for r in exact_dedup(df, "id").collect()}
    assert out["a"] == ("a", 2) and out["b"] == ("a", 2) and out["c"] == ("c", 1)


def test_minhash_neardup_finds_planted_dups(spark, tiny_corpus_dir):
    sf = with_file_id(spark.read.parquet(f"{tiny_corpus_dir}/source_files.parquet"))
    gold = with_file_id(spark.read.parquet(f"{tiny_corpus_dir}/gold_clusters.parquet"))
    pairs = minhash_neardup_pairs(sf, "file_id", "content", k_shingle=3,
                                  jaccard_threshold=0.16)
    ga = gold.select(F.col("file_id").alias("id_a"), F.col("entity_id").alias("ea"))
    gb = gold.select(F.col("file_id").alias("id_b"), F.col("entity_id").alias("eb"))
    tagged = pairs.join(ga, "id_a").join(gb, "id_b")
    n_pairs = tagged.count()
    n_same = tagged.filter(F.col("ea") == F.col("eb")).count()
    assert n_pairs > 0
    # adversarial same-vocab near-misses must not pass the Jaccard verify
    assert n_same == n_pairs


def test_simhash_close_for_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog " * 10
    edited = base.replace("lazy", "sleepy", 3)
    other = "completely unrelated words about spark catalyst optimizers " * 10
    df = spark.createDataFrame(
        [("a", base), ("b", edited), ("c", other)], "id string, content string"
    )
    fp = {r["id"]: r["simhash"] for r in simhash(df, "id", bits=32).collect()}
    ham_ab = bin(fp["a"] ^ fp["b"]).count("1")
    ham_ac = bin(fp["a"] ^ fp["c"]).count("1")
    assert ham_ab < ham_ac
    pairs = simhash_neardup_pairs(df, "id", bits=32, max_hamming=ham_ab, bands=ham_ab + 1)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert ("a", "b") in got


def test_ngram_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [("a", "one two three four five six"),
         ("b", "one two three four five seven"),
         ("c", "alpha beta gamma delta")],
        "id string, content string",
    )
    pairs = ngram_jaccard_pairs(df, "id", n=2, threshold=0.3).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {("a", "b")}


def test_ngram_jaccard_packed_key_matches_unpacked(spark):
    """The packed-int64 pair-key fast path (taken for non-negative int ids)
    must produce exactly the string-id (unpacked) result. Pins the
    shiftleft-on-IntegerType pitfall: Spark masks the shift amount to the
    input width, so ``int_col << 32`` is a no-op unless cast to long first —
    a collision bug this test would catch as merged pair counts."""
    texts = [
        "one two three four five six",
        "one two three four five seven",
        "alpha beta gamma delta epsilon",
        "alpha beta gamma delta zeta",
        "unrelated words entirely here now",
    ]
    ints = spark.createDataFrame(
        list(enumerate(texts)), "id int, content string"
    )
    strs = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "id string, content string"
    )
    got_int = {
        (str(r["id_a"]), str(r["id_b"]), r["jaccard"])
        for r in ngram_jaccard_pairs(ints, "id", n=2, threshold=0.1).collect()
    }
    got_str = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(strs, "id", n=2, threshold=0.1).collect()
    }
    assert got_int == got_str and len(got_int) >= 2


def _vec_df(spark, n=60, dim=8, seed=3):
    rng = np.random.RandomState(seed)
    base = rng.standard_normal((n, dim)).astype("float32")
    base[1] = base[0] + 0.01 * rng.standard_normal(dim).astype("float32")  # planted near-dup
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_embedding_neardup(spark):
    df = _vec_df(spark)
    got = {(r["id_a"], r["id_b"]) for r in
           embedding_neardup_pairs(df, threshold=0.99).collect()}
    assert (0, 1) in got


def test_lsh_topk_recall_vs_exact(spark):
    df = _vec_df(spark, n=120)
    queries = df.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(df, queries, k=3)
    approx = lsh_topk(df, queries, dim=8, k=3, n_planes=4, n_tables=6)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    # every query finds itself, and recall is non-trivial
    assert all((q, q) in a for q in range(8))
    assert len(e & a) / len(e) >= 0.5


def test_embedding_neardup_lsh_parity_vs_brute_force(spark):
    """The LSH-blocked scale path must be a subset of the brute-force
    baseline (identical verify ⇒ precision 1.0) with high recall at this
    plane/table setting, and must find the planted near-dup (θ≈0 pairs
    collide in every table)."""
    from wiki_entity_linker_spark.operators.dedup import embedding_neardup_lsh_pairs

    df = _vec_df(spark, n=80, dim=8)
    brute = {(r["id_a"], r["id_b"]) for r in
             embedding_neardup_pairs(df, threshold=0.6).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in
           embedding_neardup_lsh_pairs(
               df, dim=8, threshold=0.6, n_planes=4, n_tables=6
           ).collect()}
    assert lsh <= brute  # exact verify ⇒ no false positives
    assert (0, 1) in lsh  # planted near-identical pair always collides
    assert len(lsh) / max(len(brute), 1) >= 0.6  # recall at 4 planes × 6 tables


def test_ivf_topk_trained_centroids_recall(spark):
    """IVF with Lloyd-trained centroids: cells partition the corpus exactly
    once, every query finds itself, and probing nprobe cells recovers most
    of the exact top-k (the production path; the registered query uses
    seeded centroids only so its oracle stays static)."""
    from wiki_entity_linker_spark.operators.ann import (
        ivf_assign,
        ivf_topk,
        train_ivf_centroids,
    )

    df = _vec_df(spark, n=120, dim=8)
    cent = train_ivf_centroids(df, dim=8, n_centroids=6, train_limit=120, seed=5)
    assert len(cent) == 6 and all(len(c) == 8 for c in cent)
    # assignment is a partition: one cell per vector
    assign = ivf_assign(df, cent)
    assert assign.count() == 120
    assert assign.select("vec_id").distinct().count() == 120
    queries = df.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(df, queries, k=3)
    approx = ivf_topk(df, queries, cent, k=3, nprobe=3)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    assert all((q, q) in a for q in range(8))
    assert len(e & a) / len(e) >= 0.5


def test_embedding_neardup_hot_bucket_guard(spark):
    """VERDICT r3 #4: a planted hot bucket (identical vectors all colliding
    in every table) is dropped by max_bucket, bounding candidate pairs;
    without the guard the same corpus produces the full quadratic set."""
    from wiki_entity_linker_spark.operators.dedup import embedding_neardup_lsh_pairs

    n = 40
    rows = [(i, [1.0] * 8) for i in range(n)]  # one identical family
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    unguarded = embedding_neardup_lsh_pairs(
        df, dim=8, id_col="vec_id", threshold=0.9, n_planes=4, n_tables=2
    ).count()
    assert unguarded == n * (n - 1) // 2  # quadratic blow-up
    guarded = embedding_neardup_lsh_pairs(
        df, dim=8, id_col="vec_id", threshold=0.9, n_planes=4, n_tables=2,
        max_bucket=10,
    ).count()
    assert guarded == 0  # the oversized bucket is dropped in every table


def test_ivf_centroid_clamp_small_corpus(spark):
    """ADVICE r3: fewer training rows than requested centroids must clamp,
    not raise from rng.choice."""
    from wiki_entity_linker_spark.operators.ann import train_ivf_centroids

    df = _vec_df(spark, n=5, dim=8)
    cents = train_ivf_centroids(df, dim=8, n_centroids=16, id_col="vec_id")
    assert 1 <= len(cents) <= 5


def test_ivf_hot_cell_guard(spark):
    """max_cell bounds a pathological IVF cell deterministically: identical
    vectors all land in one cell; the guard truncates the candidate index
    to the lowest max_cell ids while queries still find those survivors."""
    from wiki_entity_linker_spark.operators.ann import ivf_topk

    n = 30
    rows = [(i, [1.0] * 4) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding")
    cents = [[1.0, 1.0, 1.0, 1.0], [-1.0, -1.0, -1.0, -1.0]]
    full = ivf_topk(df, queries, cents, k=50, nprobe=1)
    assert full.count() == 2 * n  # everything is a candidate
    guarded = ivf_topk(df, queries, cents, k=50, nprobe=1, max_cell=5)
    got = {r["vec_id"] for r in guarded.collect()}
    assert guarded.count() == 2 * 5
    assert got == {0, 1, 2, 3, 4}  # lowest-id survivors, deterministic


def test_minhash_incremental_equals_oneshot(spark):
    """Incremental clustering (base + batch probe) must equal one-shot
    clustering of the union — same partition, same min-member labels."""
    from wiki_entity_linker_spark.operators.closure import (
        components_with_singletons,
    )
    from wiki_entity_linker_spark.operators.dedup import (
        minhash_neardup_clusters_incremental,
    )

    rng_words = [f"w{i}" for i in range(40)]
    rows = []
    # family A: near-identical docs split across base and batch
    fam_a = " ".join(rng_words[:20])
    rows.append((1, fam_a))
    rows.append((2, fam_a + " extra"))
    rows.append((11, fam_a + " tail tok"))      # batch member joins A
    # family B entirely in batch
    fam_b = " ".join(rng_words[20:36])
    rows.append((12, fam_b))
    rows.append((13, fam_b + " more"))
    # singletons both sides
    rows.append((3, "alpha beta gamma delta epsilon zeta"))
    rows.append((14, "uno dos tres cuatro cinco seis"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = df.filter(F.col("doc_id") < 10)
    batch = df.filter(F.col("doc_id") >= 10)

    inc = minhash_neardup_clusters_incremental(
        base, batch, "doc_id", "text",
        k_shingle=3, n_hashes=16, bands=8, jaccard_threshold=0.3,
    ).collect()

    full_pairs = minhash_neardup_pairs(
        df, "doc_id", "text",
        k_shingle=3, n_hashes=16, bands=8, jaccard_threshold=0.3,
    ).select("id_a", "id_b")
    full = components_with_singletons(
        df.select(F.col("doc_id").alias("file_id")), full_pairs,
        id_col="file_id",
    ).collect()

    got = {r["id"]: r["component"] for r in inc}
    want = {r["id"]: r["component"] for r in full}
    assert got == want
    assert got[11] == got[1]  # batch doc joined the base family
    assert got[12] == got[13] != got[1]  # batch-internal family


def test_ngram_jaccard_stage_table_cut_matches_and_resumes(spark, tmp_path):
    """The cluster-scale form of the shared-subtree cut: with a StageManager
    the inverted-index/sizes materializations become durable stage tables —
    identical result to the localCheckpoint default, and a re-run over the
    same workdir RESUMES them instead of recomputing."""
    from wiki_entity_linker_spark.plans.checkpoint import StageManager

    df = spark.createDataFrame(
        [("a", "one two three four five six"),
         ("b", "one two three four five seven"),
         ("c", "alpha beta gamma delta")],
        "id string, content string",
    )
    want = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, "id", n=2, threshold=0.3).collect()
    }

    root = str(tmp_path / "ngram_stages")
    mgr1 = StageManager(spark, root, {"op": "ngram", "n": 2})
    got1 = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, "id", n=2, threshold=0.3, mgr=mgr1).collect()
    }
    assert got1 == want
    assert not any(m["resumed"] for m in mgr1.counters.values())
    assert mgr1.store.exists(spark, "ngram_inv")
    assert mgr1.store.exists(spark, "ngram_sizes")

    # fresh manager, same root + params → every cut resumes from disk
    mgr2 = StageManager(spark, root, {"op": "ngram", "n": 2})
    got2 = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, "id", n=2, threshold=0.3, mgr=mgr2).collect()
    }
    assert got2 == want
    assert mgr2.counters and all(m["resumed"] for m in mgr2.counters.values())


def test_minhash_neardup_stage_table_cut_matches(spark, tmp_path):
    from wiki_entity_linker_spark.plans.checkpoint import StageManager

    texts = [
        ("a", "the quick brown fox jumps over the lazy dog again and again"),
        ("b", "the quick brown fox jumps over the lazy dog again and once"),
        ("c", "completely different words with nothing shared at all here"),
    ]
    df = spark.createDataFrame(texts, "id string, content string")
    want = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_neardup_pairs(df, "id", k_shingle=3).collect()
    }
    mgr = StageManager(spark, str(tmp_path / "mh_stages"), {"op": "mh"})
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_neardup_pairs(df, "id", k_shingle=3, mgr=mgr).collect()
    }
    assert got == want and want  # non-empty: the planted near-pair found
    assert mgr.store.exists(spark, "minhash_toks")
    assert mgr.store.exists(spark, "minhash_blocks")


def test_segment_dedup_first_writer_wins(spark, tmp_path):
    from wiki_entity_linker_spark.operators.dedup import segment_dedup_stats
    from wiki_entity_linker_spark.plans.checkpoint import StageManager

    df = spark.createDataFrame(
        [
            (1, "a b c d a b"),  # [a b][c d][a b]: idx2 duplicates idx0
            (2, "c d e"),        # [c d] loses to doc1 idx1; ragged [e] kept
            (3, ""),             # empty: absent from the output
        ],
        "doc_id long, text string",
    )
    want = {
        1: (6, 3, 2, 4, 2),
        2: (3, 2, 1, 1, 2),
    }

    def rows(mgr=None):
        return {
            r["doc_id"]: (
                r["n_tokens"], r["n_segments"], r["n_kept"],
                r["kept_tokens"], r["dup_tokens"],
            )
            for r in segment_dedup_stats(df, seg_len=2, mgr=mgr).collect()
        }

    assert rows() == want
    # the durable-stage path is plan-identical and lands the cut on disk
    mgr = StageManager(spark, str(tmp_path / "segdedup_stages"), {"op": "sd"})
    assert rows(mgr) == want
    assert mgr.store.exists(spark, "segment_dedup_seg")


def test_exact_substring_coverage_planted(spark, tmp_path):
    from wiki_entity_linker_spark.operators.dedup import exact_substring_coverage
    from wiki_entity_linker_spark.plans.checkpoint import StageManager

    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),  # grams "a b c"@0, "b c d"@1 shared with doc2
            (2, "x a b c d y"),  # ...@1, @2 here
            (3, "z z z z"),      # "z z z" twice WITHIN the doc (suffix-array rule)
            (4, "p q"),          # shorter than k: no grams, zero coverage
        ],
        "doc_id long, text string",
    )
    # doc1: starts {0,1} -> union [0,4) = 4 of 6; doc2: {1,2} -> [1,5) = 4
    # doc3: {0,1} -> [0,4) = all 4; doc4: nothing
    want = {
        1: (6, 2, 4, 0.666667),
        2: (6, 2, 4, 0.666667),
        3: (4, 2, 4, 1.0),
        4: (2, 0, 0, 0.0),
    }

    def rows(mgr=None):
        return {
            r["doc_id"]: (
                r["n_tokens"], r["dup_starts"],
                r["covered_tokens"], r["covered_frac"],
            )
            for r in exact_substring_coverage(df, k=3, mgr=mgr).collect()
        }

    assert rows() == want
    mgr = StageManager(spark, str(tmp_path / "exsub_stages"), {"op": "es"})
    assert rows(mgr) == want
    assert mgr.store.exists(spark, "exact_substring_grams")


def test_winnowing_guarantee_and_caps(spark):
    from wiki_entity_linker_spark.operators.dedup import (
        winnowing_candidate_pairs,
        winnowing_fingerprints,
    )

    df = spark.createDataFrame(
        [
            # k=4, w=4: any shared run of k+w-1=7 tokens MUST share a print
            (1, "q1 q2 q3 s1 s2 s3 s4 s5 s6 s7 r1 r2"),
            (2, "u1 u2 s1 s2 s3 s4 s5 s6 s7 v1"),
            (3, "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10"),
            (4, "t1 t2 t3"),          # shorter than k: no fingerprints
            (5, "z z z z z z"),       # all grams equal: 1 distinct print
        ],
        "doc_id long, text string",
    )
    fp = winnowing_fingerprints(df, k=4, w=4)
    per = {r["doc_id"]: r["n"] for r in
           fp.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert 4 not in per and per[5] == 1 and per[3] >= 1

    pairs = {(r["id_a"], r["id_b"]): r["n_shared"]
             for r in winnowing_candidate_pairs(df, k=4, w=4, min_shared=1).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all(p == (1, 2) for p in pairs)

    # MOSS too-common suppression: a print shared by 3 docs dies at cap 2
    trip = spark.createDataFrame(
        [(i, "c1 c2 c3 c4 c5 c6 c7 c8") for i in range(3)],
        "doc_id long, text string",
    )
    assert winnowing_candidate_pairs(trip, k=4, w=4, min_shared=1,
                                     max_postings=2).count() == 0
    assert winnowing_candidate_pairs(trip, k=4, w=4, min_shared=1,
                                     max_postings=3).count() == 3


def test_allpairs_jaccard_exact_boundary(spark):
    from wiki_entity_linker_spark.operators.dedup import allpairs_jaccard_join

    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c e"),
            (3, "a b"),
            (4, "x y z w"),
            (5, "a"),
        ],
        "doc_id long, text string",
    )
    got = {(r["id_a"], r["id_b"]): (r["inter"], r["union_sz"], r["jaccard"])
           for r in allpairs_jaccard_join(df, threshold="0.5",
                                          k_shingle=1).collect()}
    # J=0.5 pairs sit EXACTLY on the threshold: the integer-rational
    # acceptance (inter*den >= num*union) must include them
    assert got == {
        (1, 2): (3, 5, 0.6),
        (1, 3): (2, 4, 0.5),
        (2, 3): (2, 4, 0.5),
        (3, 5): (1, 2, 0.5),
    }


def test_dedup_verdicts_all_branches(spark, tmp_path):
    from wiki_entity_linker_spark.queries import dedup_verdicts

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),   # exact dup of 1
            (3, "alpha beta gamma delta epsilon eta"),    # 5/6 tokens in a
                                                          # shared substring
            (4, "unique tokens nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    d = str(tmp_path / "docs")
    docs.write.parquet(f"{d}/documents.parquet")
    got = {r["doc_id"]: r["verdict"]
           for r in dedup_verdicts(spark, d).collect()}
    assert got[2] == "drop_exact_dup"
    assert got[1] == "drop_boilerplate"   # its text is duplicated BY doc 2
    assert got[3] == "drop_boilerplate"   # shared 5-gram prefix with 1 and 2
    assert got[4] == "keep"
