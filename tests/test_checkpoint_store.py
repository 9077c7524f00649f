"""StageManager store seam: parquet default, Iceberg-shaped swap, resume-key
input identity (VERDICT r1 #10 + ADVICE resume-key finding)."""

import pytest
from pyspark.sql import functions as F

from wiki_entity_linker_spark.plans.checkpoint import (
    IcebergStore,
    ParquetStore,
    StageManager,
)


class RecordingStore(ParquetStore):
    """Parquet store that records which seam methods the manager calls."""

    def __init__(self, root):
        super().__init__(root)
        self.calls = []

    def write(self, spark, name, df):
        self.calls.append(("write", name))
        return super().write(spark, name, df)

    def read(self, spark, name):
        self.calls.append(("read", name))
        return super().read(spark, name)


def test_stage_manager_uses_store_seam(spark, tmp_path):
    root = str(tmp_path / "run")
    store = RecordingStore(root)
    mgr = StageManager(spark, root, {"p": 1}, store=store)
    df = mgr.stage("s1", lambda: spark.range(10).select(F.col("id")))
    assert df.count() == 10
    assert store.calls == [("write", "s1")]

    # resume goes through store.read, not a hardcoded parquet path
    store2 = RecordingStore(root)
    mgr2 = StageManager(spark, root, {"p": 1}, store=store2)
    df2 = mgr2.stage("s1", lambda: spark.range(99))
    assert df2.count() == 10  # stored result, builder not re-run
    assert store2.calls == [("read", "s1")]
    assert mgr2.counters["s1"]["resumed"] is True

    # param change invalidates: write again
    store3 = RecordingStore(root)
    mgr3 = StageManager(spark, root, {"p": 2}, store=store3)
    df3 = mgr3.stage("s1", lambda: spark.range(5))
    assert df3.count() == 5
    assert store3.calls == [("write", "s1")]


def test_iceberg_store_shape(spark):
    st = IcebergStore("lake", "er_stages")
    assert st.table("edges") == "lake.er_stages.edges"
    # no Iceberg catalog on the test session → detectably unavailable
    assert IcebergStore.available(spark, "lake") is False


def test_er_resume_key_covers_input_identity(spark, tmp_path):
    """Same workdir + same config but DIFFERENT input must invalidate."""
    from wiki_entity_linker_spark.plans.er_pipeline import _input_fingerprint

    a = spark.createDataFrame([(1, "x")], "id long, content string")
    b = spark.createDataFrame([(1, "x"), (2, "y")], "id long, content string")
    assert _input_fingerprint(a) != _input_fingerprint(b)
    # parquet-backed: identity from the file listing, no scan
    p1 = str(tmp_path / "t1.parquet")
    p2 = str(tmp_path / "t2.parquet")
    a.write.parquet(p1)
    a.write.parquet(p2)
    f1 = _input_fingerprint(spark.read.parquet(p1))
    f2 = _input_fingerprint(spark.read.parquet(p2))
    assert f1 != f2
    assert f1 == _input_fingerprint(spark.read.parquet(p1))
