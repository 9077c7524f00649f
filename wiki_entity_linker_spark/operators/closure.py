"""Iterative graph operators: connected components + transitive closure.

The reference's only iterative dataflow is the Wikidata type closure
(`P31 ∪ P31/P279+`, wikidata-types/Makefile:293-301; recursive superclass walk
with a cycle set, scripts/create_all_types_mapping.py:20-49). The graft needs
the same skeleton twice:

* :func:`connected_components` — alternating **large-star / small-star**
  (Kiveris et al., "Connected Components in MapReduce and Beyond"): O(log n)
  rounds, each round two groupBy-min shuffles; per-round ``localCheckpoint``
  cuts lineage so plans don't grow (the driver-loop is control flow only —
  all data stays distributed).
* :func:`transitive_closure` — frontier-expansion reachability with a depth
  cap and cycle safety via accumulated ``dropDuplicates``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Direct every edge large→small, drop self-loops and duplicates."""
    return (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: connect all strictly-larger neighbors to
    min(Γ(u) ∪ {u})."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.min("v").alias("mn"))
    m = m.select("u", F.least(F.col("u"), F.col("mn")).alias("m"))
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def _small_star(e: DataFrame) -> DataFrame:
    """For each node u over its ≤ neighbors: connect them (and u) to the min."""
    directed = _canonical_edges(e, "u", "v")
    m = directed.groupBy("u").agg(F.min("v").alias("m"))
    moved = (
        directed.join(m, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    kept = m.select(F.col("u"), F.col("m").alias("v"))
    return (
        moved.unionByName(kept)
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )


class _scoped_shuffle_partitions:
    """Temporarily lower ``spark.sql.shuffle.partitions`` around an
    iterative driver loop. Star-contraction rounds are many small BARRIER
    stages; on a small graph their wall time is pure task-dispatch latency,
    so a 32-partition shuffle of a thousand edges costs 4× the scheduling of
    an 8-partition one for zero parallelism gain. At scale callers pass
    ``None`` and the session setting stands."""

    def __init__(self, spark, n: int | None):
        self.spark, self.n, self.old = spark, n, None

    def __enter__(self):
        if self.n is not None:
            self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
            self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))

    def __exit__(self, *exc):
        if self.old is not None:
            self.spark.conf.set("spark.sql.shuffle.partitions", self.old)


def _local_union_find(spark, e: DataFrame) -> DataFrame:
    """Finish a (bounded) edge set on the driver: union-find with path
    compression, components labeled by min member — identical output
    contract to the distributed loop (members + roots, one row per node
    appearing in the edge set)."""
    import pandas as pd

    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    pdf = e.select("u", "v").toPandas()  # Arrow transfer, one job
    for u, v in zip(pdf["u"], pdf["v"]):
        ru, rv = find(u), find(v)
        if ru != rv:
            # union by min so the final find walk ends at the min id
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    rows = [(x, find(x)) for x in list(parent)] + [
        (r, r) for r in set(parent.values()) if parent.get(r, r) == r
    ]
    # roots that never appear as a key (only ever targets)
    all_nodes = set(parent)
    roots = {find(x) for x in parent}
    rows += [(r, r) for r in roots - all_nodes]
    rows = sorted(set(rows))
    out_schema = (
        "id " + e.schema["u"].dataType.simpleString()
        + ", component " + e.schema["v"].dataType.simpleString()
    )
    out = pd.DataFrame(rows, columns=["id", "component"])
    return spark.createDataFrame(out, out_schema)  # Arrow path back up


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    shuffle_partitions: int | None = None,
    local_solve_threshold: int = 0,
) -> DataFrame:
    """→ ``(id, component)`` where component = min node id of the component.

    Nodes appearing only as isolated vertices must be handled by the caller
    (left-join the result and coalesce to the node's own id).
    ``shuffle_partitions``: scoped override for small graphs (see
    :class:`_scoped_shuffle_partitions`).

    ``local_solve_threshold``: when > 0 and the canonical edge set (checked
    before the loop and after every contraction round) fits under it, the
    remaining graph is finished on the driver with union-find — the CC-MR
    hybrid: star-contraction shrinks the edge set geometrically, so the tail
    rounds are pure task-dispatch latency on data that fits in one process.
    Size the threshold to the ID TYPE: ~32 MB of Arrow per 2M int64-id
    edges, but ~10-15x that in driver RSS for 64-char string ids (the ER
    pipeline uses 500k for its sha256 ids); each avoided round saves 2
    shuffles + a checkpoint + a stats job. 0 (the default, and what the
    registered oracle queries use) keeps the loop fully distributed to
    convergence.
    """
    def _stats(d: DataFrame) -> tuple:
        """Cheap set fingerprint: (count, xors of two DISTINCT hash
        functions over each row) in ONE job — an exceptAll-based convergence
        test costs a full extra shuffle per round and dominated wall time at
        scale. xxhash64(u, v) and xxhash64(u, v, <const>) are the same seed
        over different column tuples — two distinct functions, not
        independent seeds — which still pushes the same-count collision odds
        from ~2^-64 toward ~2^-128: a set change only goes unnoticed if BOTH
        xors collide simultaneously."""
        r = d.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h1"),
            F.expr("bit_xor(xxhash64(u, v, 1658234568))").alias("h2"),
        ).collect()[0]
        return (r["n"], r["h1"], r["h2"])

    spark = edges.sparkSession
    converged = False
    with _scoped_shuffle_partitions(spark, shuffle_partitions):
        e = _canonical_edges(edges, src, dst).localCheckpoint(eager=True)
        prev = _stats(e)
        if local_solve_threshold and prev[0] <= local_solve_threshold:
            return _local_union_find(spark, e)
        for _ in range(max_iter):
            e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
            cur = _stats(e2)
            e = e2
            if local_solve_threshold and cur[0] <= local_solve_threshold:
                return _local_union_find(spark, e)
            if cur == prev:
                converged = True
                break
            prev = cur
    if not converged:
        # A partially-converged edge set still contains conflicting
        # (id, component) rows; the dropDuplicates below would pick one
        # arbitrarily and return silently-wrong labels. Fail loudly instead.
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds; raise max_iter (rounds needed ≈ log2(graph diameter))."
        )
    # e is now (member, root≈min); close the one remaining level of
    # indirection (star edges may still point at a non-root after the last
    # small-star round), then add roots themselves
    roots = e.select(F.col("v").alias("id")).subtract(e.select(F.col("u").alias("id")))
    members = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    return members.unionByName(
        roots.select("id", F.col("id").alias("component"))
    ).dropDuplicates(["id"])


def components_with_singletons(
    nodes: DataFrame, edges: DataFrame, id_col: str = "file_id",
    src: str = "id_a", dst: str = "id_b", max_iter: int = 20,
    shuffle_partitions: int | None = None,
    local_solve_threshold: int = 0,
) -> DataFrame:
    """All nodes labeled: edge components + singletons as their own id."""
    comp = connected_components(
        edges, src, dst, max_iter, shuffle_partitions, local_solve_threshold
    )
    return (
        nodes.select(F.col(id_col).alias("id"))
        .dropDuplicates(["id"])
        .join(comp, "id", "left")
        .select("id", F.coalesce("component", "id").alias("component"))
    )


def _local_closure(
    spark, base: DataFrame, depth_cap: int, rounds: int, max_depth: int
) -> DataFrame:
    """Finish a (bounded) edge set on the driver: BFS closure with min-depth
    tracking — identical output AND identical depth-overflow semantics to
    the distributed doubling loop (which converges iff every reachable
    pair's min path length is ≤ ``depth_cap`` = 2^(rounds-1))."""
    import pandas as pd

    pdf = base.select("a", "b").toPandas()  # Arrow transfer, one job
    adj: dict = {}
    for a, b in zip(pdf["a"], pdf["b"]):
        adj.setdefault(a, []).append(b)
    rows = []
    overflow = False
    from collections import deque

    for s in adj:
        depth = {s: 0}
        dq = deque([s])
        while dq:
            x = dq.popleft()
            d = depth[x] + 1
            for y in adj.get(x, ()):  # noqa: B905
                if y not in depth:
                    depth[y] = d
                    dq.append(y)
                    if y != s:
                        rows.append((s, y))
                        if d > depth_cap:
                            overflow = True
    if overflow:
        raise RuntimeError(
            f"transitive_closure did not converge within {rounds} doubling "
            f"rounds (max_depth={max_depth}): the graph has paths longer "
            "than max_depth. Raise max_depth (rounds grow only "
            "logarithmically) or break cycles upstream."
        )
    out_schema = (
        "a " + base.schema["a"].dataType.simpleString()
        + ", b " + base.schema["b"].dataType.simpleString()
    )
    out = pd.DataFrame(sorted(set(rows)), columns=["a", "b"])
    return spark.createDataFrame(out, out_schema)


def transitive_closure(
    edges: DataFrame,
    src: str = "child",
    dst: str = "parent",
    max_depth: int = 20,
    shuffle_partitions: int | None = None,
    local_solve_threshold: int = 0,
) -> DataFrame:
    """All (src, ancestor) pairs reachable via directed edges — the Spark
    recast of create_all_types_mapping.py:20-49 (depth-capped, cycle-safe).

    Uses **iterative doubling** (R := R + R.R): reachable depth doubles per
    round, so ``ceil(log2(max_depth))`` rounds suffice and — critically —
    the logical plan only gains a constant number of nodes per round. A
    frontier-expansion loop that subtracts the accumulated closure from each
    step references the closure twice per iteration, doubling the *plan* per
    round; Catalyst analysis then dominates the runtime long before the data
    does (measured: 160 s at round 5 on a 254-edge graph).

    ``local_solve_threshold``: when > 0 and the deduped edge set fits under
    it, the closure is finished on the driver with BFS (min-depth tracked, so
    the depth-overflow raise is bit-identical to the doubling loop's
    convergence bound) — the same tail-solve discipline as
    :func:`connected_components`'s CC-MR hybrid: the doubling loop's rounds
    are pure task-dispatch latency on a graph that fits in one process. Size
    it to BOTH driver memory for the output pairs (≤ nodes × reachable-set)
    and the O(V·E) BFS cost — a few thousand edges is the sweet spot; 0 (the
    default) keeps the loop fully distributed.
    """
    import math

    with _scoped_shuffle_partitions(edges.sparkSession, shuffle_partitions):
        base = (
            edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .filter(F.col("a") != F.col("b"))
            .dropDuplicates(["a", "b"])
            .persist()
        )
        closure = base
        prev = closure.count()
        # +1 confirmation round: a graph of depth exactly max_depth still
        # grows in the final doubling round, so convergence needs one extra
        # no-growth round to be observable
        rounds = max(1, math.ceil(math.log2(max(2, max_depth)))) + 1
        if local_solve_threshold and prev <= local_solve_threshold:
            out = _local_closure(
                edges.sparkSession, base, 2 ** (rounds - 1), rounds, max_depth
            )
            base.unpersist()
            return out.select(F.col("a").alias(src), F.col("b").alias(dst))
        converged = False
        for _ in range(rounds):
            doubled = (
                closure.alias("l")
                .join(closure.alias("r"), F.col("l.b") == F.col("r.a"))
                .select(F.col("l.a").alias("a"), F.col("r.b").alias("b"))
                .filter(F.col("a") != F.col("b"))
            )
            nxt = closure.unionByName(doubled).dropDuplicates(["a", "b"]).persist()
            n = nxt.count()  # materializes nxt, so the old closure can be dropped
            if closure is not base:
                closure.unpersist()  # bound executor storage: one live round only
            closure = nxt
            if n == prev:
                converged = True
                break
            prev = n
        base.unpersist()
        if not converged:
            # mirror connected_components' loud non-convergence: a silently
            # partial closure corrupts every downstream join
            closure.unpersist()
            raise RuntimeError(
                f"transitive_closure did not converge within {rounds} doubling "
                f"rounds (max_depth={max_depth}): the graph has paths longer "
                f"than max_depth. Raise max_depth (rounds grow only "
                f"logarithmically) or break cycles upstream."
            )
    return closure.select(F.col("a").alias(src), F.col("b").alias(dst))


def relabel_through_map(
    df: DataFrame,
    relabel_map: DataFrame,
    id_col: str = "id",
    comp_col: str = "component",
) -> DataFrame:
    """Apply a ``(__old_c, __new_c)`` relabel map to an ``(id, component)``
    table: rows whose component appears in the map take the new label,
    everything else passes through verbatim. The single relabel shape shared
    by :func:`merge_components`, the incremental assignment stage, and
    ``read_canonical``'s delta resolution — hint ``relabel_map`` with
    ``F.broadcast`` (or rely on Catalyst's size stats for parquet-backed
    maps) per call site."""
    return df.join(
        relabel_map, df[comp_col] == relabel_map["__old_c"], "left"
    ).select(
        df[id_col].alias("id"),
        F.coalesce(relabel_map["__new_c"], df[comp_col]).alias("component"),
    )


def merge_components(
    old_comps: DataFrame,
    edges: DataFrame,
    new_nodes: DataFrame,
    id_col: str = "id",
    comp_col: str = "component",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    local_solve_threshold: int = 0,
    broadcast_threshold: int = 500_000,
    return_map: bool = False,
) -> DataFrame:
    """Absorb a batch of new nodes into an existing components labeling
    WITHOUT re-running connected components over the old graph.

    The incremental-append primitive (north-rule scale path): at 10^12 files
    a daily batch must not re-cluster the corpus, and it doesn't need to —
    ``old_comps`` is already transitively closed, so every old endpoint of a
    new edge can be CONTRACTED to its component label. The merge graph then
    contains only new nodes and touched old component labels: its size is
    O(batch), independent of the corpus.

    Inputs:

    * ``old_comps`` — ``(id, component)``, transitively closed (labels =
      min member id, as produced by :func:`components_with_singletons`);
    * ``edges`` — new match edges; endpoints may be new-node ids or old ids
      (old endpoints are contracted via ``old_comps``);
    * ``new_nodes`` — the batch's node ids, DISJOINT from ``old_comps``
      (unmatched ones become singleton clusters).

    Output ``(id, component)`` over old ∪ new nodes, with two guarantees:

    * clusters untouched by any new edge keep their component label
      verbatim (stable ids across appends);
    * touched clusters relabel to min(member id) over the merged cluster —
      exactly what a full recompute over old ∪ new would produce, so
      incremental == batch for any edge set (the label of a contracted old
      cluster IS its min member, so min over the mini graph's nodes equals
      min over the underlying members).
    """
    e = edges.select(F.col(src).alias("id_a"), F.col(dst).alias("id_b"))
    for side in ("id_a", "id_b"):
        e = (
            e.join(
                old_comps.select(
                    F.col(id_col).alias(side), F.col(comp_col).alias("__c")
                ),
                side,
                "left",
            )
            .withColumn(side, F.coalesce("__c", F.col(side)))
            .drop("__c")
        )
    e = (
        e.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
        # batch-sized by construction; materialize ONCE — the contraction
        # joins above are otherwise re-evaluated by every downstream action
        # (edge count, local-solve collect, mini-CC rounds, the caller's
        # stage write), measured as ~3× the merge stage's wall time
        .localCheckpoint(eager=True)
    )
    # node set of the mini graph: all new nodes (singleton guarantee) plus
    # every contracted endpoint, so touched old labels appear in the output
    # of the mini solve and feed the relabel map below
    nodes = (
        new_nodes.select(F.col(id_col).alias("id"))
        .unionByName(e.select(F.col("id_a").alias("id")))
        .unionByName(e.select(F.col("id_b").alias("id")))
    )
    mini = components_with_singletons(
        nodes,
        e,
        id_col="id",
        max_iter=max_iter,
        local_solve_threshold=local_solve_threshold,
    ).localCheckpoint(eager=True)  # consumed 3×: merge map, relabel, new rows
    # touched-cluster relabel map: rows of the mini solve whose node id IS an
    # old component label; batch-sized by construction → broadcast when it
    # actually fits (size probed below)
    old_labels = old_comps.select(F.col(comp_col).alias("id")).dropDuplicates(["id"])
    merge_map = (
        mini.join(old_labels, "id", "left_semi")
        .select(F.col("id").alias("__old_c"), F.col("component").alias("__new_c"))
        .filter(F.col("__old_c") != F.col("__new_c"))
        # materialize once: consumed by the size probe AND the relabel join
        # (and the semi-join against corpus-sized old_labels must not rerun)
        .localCheckpoint(eager=True)
    )
    # batch-sized by construction, but a pathological batch (one edge set
    # bridging millions of base clusters) would blow a forced broadcast —
    # probe the actual size and fall back to a shuffle join above the
    # threshold (~150 B/row driver-side for sha256 string labels, so the
    # 500k default budgets ~75 MB)
    probed_map = (
        F.broadcast(merge_map)
        if merge_map.count() <= broadcast_threshold
        else merge_map
    )
    relabeled_old = relabel_through_map(
        old_comps, probed_map, id_col=id_col, comp_col=comp_col
    )
    new_assign = mini.join(
        new_nodes.select(F.col(id_col).alias("id")), "id", "left_semi"
    ).select("id", "component")
    out = relabeled_old.unionByName(new_assign)
    if return_map:
        # the batch-sized relabel map is a byproduct the incremental append
        # needs verbatim (its assignment stage applies the SAME map to the
        # corpus-sized assignment) — returning it saves the caller a
        # corpus-scale re-derivation from the merged output
        return out, merge_map
    return out
