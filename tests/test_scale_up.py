"""The sf1 bench fixture must be deterministic (byte-stable keys/rows) and
key-disjoint so round-over-round sf1 numbers are comparable."""

import os

import pytest
from pyspark.sql import functions as F

from wiki_entity_linker_spark.fixtures.scale_up import _replicate

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/testdata/sf0.001"),
    reason="driver testdata not present")


def test_replication_deterministic_and_disjoint(spark):
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = _replicate(src, "documents", 3)
    b = _replicate(src, "documents", 3)
    n_src = src.count()
    assert a.count() == 3 * n_src
    # ids dense and disjoint across replicas
    assert a.select("doc_id").distinct().count() == 3 * n_src
    # byte-stable: same content hash across two constructions (bit_xor —
    # a long sum overflows under ANSI mode)
    h = lambda d: d.select(
        F.expr("bit_xor(xxhash64(doc_id, text))").alias("h")).first()["h"]
    assert h(a) == h(b)
    # replica tag present so near-dup families are bounded, not exact dupes
    texts = [r["text"] for r in a.filter(F.col("doc_id") < 9).collect()]
    assert any(t.endswith("rep1") for t in texts)


def test_replication_preserves_fk_space(spark):
    src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    rep = _replicate(src, "orders", 2)
    src_keys = {r["o_custkey"] for r in src.select("o_custkey").distinct().collect()}
    rep_keys = {r["o_custkey"] for r in rep.select("o_custkey").distinct().collect()}
    assert rep_keys == src_keys  # customer FK space untouched
