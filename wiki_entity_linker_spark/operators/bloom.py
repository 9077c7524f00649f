"""Deterministic Bloom-filter membership prefilter.

The 100 TB shape of "which corpus n-grams appear in the benchmark set":
the exact formulation shuffles EVERY corpus gram to the join — the bloom
formulation builds a bit-array from the (small) benchmark side once,
broadcasts it as ONE ROW (m/64 int64 words), and tests membership
ROW-LOCALLY in the scan; only probable hits (true positives + the
controlled false-positive tail) ever reach the exact verify join. No
false negatives by construction, so `bloom-prefilter → exact verify`
returns bit-identically the exact answer — which is what the registered
query's oracle pins.

Everything is the portable md5-based ``h64`` family (functions/hashing),
so the filter itself is deterministic across engines and runs — the same
discipline as the MinHash family, and unlike ``java.util.Random``-seeded
builtins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wiki_entity_linker_spark.functions.hashing import h64_seeded


def bloom_bitmap(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 18, k: int = 3
) -> DataFrame:
    """Build the filter: → ONE row ``(bitmap array<long>)`` of ``m_bits/64``
    words with bit ``h_i(key) mod m_bits`` set for every key and every
    ``i < k``.

    Scale shape: the only key-sized work is one map-side-combinable
    ``groupBy(word)`` over k·|keys| (word, bit) rows; the dense-array
    assembly (collect + transform over ``sequence``) runs on the
    word-cardinality summary frame (≤ m_bits/64 rows — 4096 words for the
    default 2^18 bits, a 32 KB broadcast).
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    n_words = m_bits // 64
    pos = keys.select(
        F.explode(
            F.array(
                *[h64_seeded(key_col, i) % m_bits for i in range(k)]
            )
        ).alias("pos")
    )
    words = pos.select(
        F.expr("pos div 64").alias("word"),
        # shift amount is a COLUMN, so call the SQL function directly
        # (the python F.shiftleft wrapper only takes an int literal)
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
        ).alias("b"),
    ).groupBy("word").agg(F.bit_or("b").alias("bits"))
    sparse = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("word"), F.col("bits")))
        ).alias("m")
    )
    return sparse.select(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(n_words - 1).cast("long")),
            lambda w: F.coalesce(
                F.element_at("m", w), F.lit(0).cast("long")
            ),
        ).alias("bitmap")
    )


def bloom_contains(
    key: Column | str, bitmap: Column | str, m_bits: int = 1 << 18, k: int = 3
) -> Column:
    """Row-local membership test against a ``bloom_bitmap`` column (join the
    1-row bitmap in with ``crossJoin(F.broadcast(...))`` first). True for
    every inserted key (no false negatives); false positives at the usual
    (1 - e^{-kn/m})^k rate — callers needing exactness verify hits against
    the real key set, touching only this pre-filtered sliver.
    """
    key = F.col(key) if isinstance(key, str) else key
    bm = F.col(bitmap) if isinstance(bitmap, str) else bitmap
    cond = F.lit(True)
    for i in range(k):
        pos = h64_seeded(key, i) % m_bits
        bit = (pos % 64).cast("int")
        # pos < m_bits <= 2^53, so the double division is exact
        word = ((pos - (pos % 64)) / 64).cast("long")
        cond = cond & (
            F.element_at(bm, (word + 1).cast("int")).bitwiseAND(
                F.call_function("shiftleft", F.lit(1).cast("long"), bit)
            )
            != 0
        )
    return cond
