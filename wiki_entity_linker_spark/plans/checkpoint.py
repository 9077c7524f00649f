"""Checkpointed stage tables with per-partition lineage + counters.

The reference's resumability is Make's skip-if-output-exists
(Makefile:178-198) plus ``--start_line`` resume knobs
(create_entity_word_vectors.py:31). The graft requires the same contract as
first-class dataflow: every pipeline stage writes a stage table through a
swappable store — :class:`ParquetStore` (default) or :class:`IcebergStore`
(``writeTo(...).createOrReplace()`` when an Iceberg catalog is configured) —
together with a manifest recording ``params_hash``, total and
per-partition row counts. Re-running with identical params skips straight to
the stored table; changing any upstream param invalidates every downstream
stage (hash chaining).
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def params_hash(params: dict) -> str:
    return hashlib.sha256(
        json.dumps(params, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


def partition_lineage(df: DataFrame) -> list[dict]:
    """Per-partition row counters (X4 telemetry analogue, link_text.py:100-107)."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("rows"))
        .collect()
    )
    return [{"partition_id": r["partition_id"], "rows": r["rows"]} for r in rows]


class ParquetStore:
    """Default stage-table store: one parquet directory per stage."""

    def __init__(self, root: str):
        self.root = root

    def write(self, spark: SparkSession, name: str, df: DataFrame) -> DataFrame:
        path = os.path.join(self.root, f"{name}.parquet")
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self.root, f"{name}.parquet"))

    def exists(self, spark: SparkSession, name: str) -> bool:
        return os.path.isdir(os.path.join(self.root, f"{name}.parquet"))

    def delete(self, spark: SparkSession, name: str) -> None:
        import shutil

        shutil.rmtree(os.path.join(self.root, f"{name}.parquet"), ignore_errors=True)


class IcebergStore:
    """Iceberg stage-table store: ``writeTo(...).createOrReplace()`` behind
    the same seam (the SURVEY risk-register swap, one interface).

    Requires an Iceberg catalog on the session
    (``spark.sql.catalog.<catalog>`` + iceberg-spark-runtime jar); use
    :meth:`available` to pick a store at runtime. Each stage becomes the
    table ``<catalog>.<namespace>.<name>`` — atomic replace, snapshot
    history and partition metadata come from the Iceberg spec itself.

    SANDBOX STATUS: shape-tested only (tests/test_checkpoint_store.py). The
    iceberg-spark-runtime jar is not in this container and there is no
    network access to fetch it, so this store has never run against a real
    catalog here. To exercise it on a cluster::

        spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
          --conf spark.sql.catalog.er=org.apache.iceberg.spark.SparkCatalog \\
          --conf spark.sql.catalog.er.type=hadoop \\
          --conf spark.sql.catalog.er.warehouse=<path> ...

    then pass ``store=IcebergStore("er")`` to ``run_er_pipeline``.
    """

    def __init__(self, catalog: str, namespace: str = "er_stages"):
        self.catalog = catalog
        self.namespace = namespace

    def table(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    @staticmethod
    def available(spark: SparkSession, catalog: str) -> bool:
        try:
            spark.conf.get(f"spark.sql.catalog.{catalog}")
            return True
        except Exception:
            return False

    def write(self, spark: SparkSession, name: str, df: DataFrame) -> DataFrame:
        spark.sql(
            f"CREATE NAMESPACE IF NOT EXISTS {self.catalog}.{self.namespace}"
        )
        df.writeTo(self.table(name)).using("iceberg").createOrReplace()
        return spark.read.table(self.table(name))

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.table(self.table(name))

    def exists(self, spark: SparkSession, name: str) -> bool:
        return spark.catalog.tableExists(self.table(name))

    def delete(self, spark: SparkSession, name: str) -> None:
        spark.sql(f"DROP TABLE IF EXISTS {self.table(name)}")


class StageManager:
    """Skip-if-complete stage runner.

    >>> mgr = StageManager(spark, "/tmp/er_run", {"threshold": 0.4})
    >>> edges = mgr.stage("edges", lambda: build_edges(...))
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        params: dict | None = None,
        enabled: bool = True,
        store: ParquetStore | IcebergStore | None = None,
    ):
        """``enabled=False`` turns the manager into a passthrough (each stage
        is ``localCheckpoint``-ed to cut lineage but nothing hits disk and no
        counters are collected) — used by throughput benchmarks where the
        durability contract isn't under test. ``store`` swaps the stage-table
        backend (parquet directories by default, Iceberg tables when a
        catalog is configured); resume manifests stay as JSON files under
        ``root`` either way."""
        self.spark = spark
        self.root = root
        self.enabled = enabled
        self.store = store or ParquetStore(root)
        self.chain_hash = params_hash(params or {})
        self.counters: dict[str, dict] = {}
        if enabled:
            os.makedirs(root, exist_ok=True)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.meta.json")

    def stage(
        self,
        name: str,
        build: Callable[[], DataFrame],
        collect_lineage: bool = True,
        cache: bool = True,
    ) -> DataFrame:
        """Run (or resume) one stage; chain the params hash downstream.

        ``cache=False`` marks a stage as cheap-to-recompute (e.g. a
        projection of the raw scan): in passthrough mode it is NOT persisted
        — executor storage memory is a budget, and caching bulk columns that
        are consumed once starves the caches that are actually reused.
        """
        if not self.enabled:
            # persist (lazy): computed once on first action, REUSED by every
            # downstream stage — a lazy localCheckpoint here caused repeated
            # recomputation of shared stages (features was rebuilt by both
            # the blocking and scoring stages: 2x shingle+hash cost)
            df = build()
            return df.persist() if cache else df
        meta_path = self._meta_path(name)
        # every stage's identity folds in upstream identities
        stage_hash = params_hash({"prev": self.chain_hash, "stage": name})
        self.chain_hash = stage_hash
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            if meta.get("params_hash") == stage_hash:
                self.counters[name] = meta | {"resumed": True}
                return self.store.read(self.spark, name)
        df = build()
        # a build may itself run NESTED stages (operators thread mgr= into
        # their internal cuts): restore this stage's hash afterwards so the
        # chain seen downstream is identical whether the build ran or the
        # stage resumed (a resumed stage never executes the nested calls)
        self.chain_hash = stage_hash
        out = self.store.write(self.spark, name, df)
        meta = {
            "stage": name,
            "params_hash": stage_hash,
            "rows_out": out.count(),
            "partitions": partition_lineage(out) if collect_lineage else [],
        }
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        self.counters[name] = meta | {"resumed": False}
        return out
