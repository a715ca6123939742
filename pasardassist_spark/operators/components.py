"""Connected components over a pair list — the last stage of every dedup
pipeline: near-dup PAIRS (from MinHash/SimHash/Jaccard/embedding blocking)
become duplicate CLUSTERS, and each cluster elects one canonical keeper.

The reference deduplicates row-at-a-time with idempotent natural-key upserts
(reference db.service.ts:154-160); at corpus scale the equivalent is a
transitive closure over the near-dup graph, which has no single-pass SQL
form — it is the one genuinely iterative algorithm in this repo.

Algorithm: alternating large-star / small-star (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014) — the standard
shuffle-based CC with O(log^2 n) round convergence INDEPENDENT of graph
diameter. Naive min-label propagation needs O(diameter) rounds, and dedup
graphs can chain (A~B~C~... with no direct A~C edge), so diameter is
unbounded; the star algorithm is the scale-safe choice.

Design for 100 TB:

- Each round is two hash-shuffles (a groupBy(min) and a join per star
  step) over the CURRENT edge set, which only shrinks toward one edge per
  non-root node. No step ever materializes neighborhoods as arrays — hot
  (high-degree) nodes stay row-shaped, so a 100M-duplicate cluster is an
  AQE skew-split, not an executor OOM.
- ``localCheckpoint(eager=True)`` after every round cuts the lineage —
  without it, round k's plan nests k copies of the join DAG and the
  optimizer re-plans an exponentially growing tree.
- Convergence is detected by an order-insensitive signature
  (bit_xor of xxhash64 over the distinct edge set + count — xor can't
  overflow under ANSI mode): one tiny agg per round, no exceptAll
  anti-join of two big sets.
- The driver-side loop is O(log^2 n) actions — for a trillion-edge graph
  that is ~40 rounds; each action is fully distributed.

Cache-lifetime contract (r19, ADVICE note): several operators here
persist() staged frames (adjacency, edge sets) and localCheckpoint() per
round; the returned plan references those blocks, so the CALLER owns
release — ``pasardassist_spark.caching.release_all(spark)`` between
independent queries (bench/full_sweep do this), which also drops the
checkpoint block RDDs plain clearCache leaves pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_INTERNAL = ("_u", "_v", "_m")


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 40
) -> DataFrame:
    """Resolve undirected ``(src, dst)`` pairs into components.

    Returns ``(node, component)`` — one row per node that appears in any
    edge, where ``component`` is the MINIMUM node id of its component (a
    stable, deterministic cluster id under any partitioning). Nodes with no
    edges don't appear; callers union singletons back (see
    ``queries/dedup.py::dedup_clusters``).

    Self-loops and null endpoints are dropped (a null id joins nothing,
    matching equi-join semantics elsewhere in the repo).
    """
    clash = set(_INTERNAL) & set(edges.columns)
    if clash:
        raise ValueError(
            f"edge columns collide with internal names: {sorted(clash)}"
        )
    # normalize: oriented u > v, distinct, no self-loops/nulls
    e = (
        edges.select(F.col(src).alias("_a"), F.col(dst).alias("_b"))
        .filter(
            F.col("_a").isNotNull() & F.col("_b").isNotNull() & (F.col("_a") != F.col("_b"))
        )
        .select(F.greatest("_a", "_b").alias("_u"), F.least("_a", "_b").alias("_v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig: tuple | None = None
    for _ in range(max_iter):
        # -- large-star: connect every strictly-larger neighbor of u to the
        # minimum of u's full neighborhood (incl. u). Each undirected edge is
        # seen from both endpoints; only the larger endpoint emits, so the
        # edge count never grows.
        sym = e.select("_u", "_v").union(
            e.select(F.col("_v").alias("_u"), F.col("_u").alias("_v"))
        )
        mins = (
            sym.groupBy("_u")
            .agg(F.min("_v").alias("_m"))
            .withColumn("_m", F.least("_m", F.col("_u")))
        )
        large = (
            sym.join(mins, "_u")
            .filter(F.col("_v") > F.col("_u"))
            # (v, m): v > u >= m, so the output stays oriented larger-first
            .select(F.col("_v").alias("_u"), F.col("_m").alias("_v"))
            .filter(F.col("_u") != F.col("_v"))
        )
        # -- small-star: on the (u > v)-oriented edges, rewire every smaller
        # neighbor of u — and u itself — to u's minimum neighbor.
        mins2 = large.groupBy("_u").agg(F.min("_v").alias("_m"))
        small = (
            large.join(mins2, "_u")
            .select(F.col("_v").alias("_n"), "_m")
            .union(mins2.select(F.col("_u").alias("_n"), "_m"))
            .filter(F.col("_n") != F.col("_m"))
            .select(F.col("_n").alias("_u"), F.col("_m").alias("_v"))
            .distinct()
        )
        e = small.localCheckpoint(eager=True)  # cut lineage every round
        sig = tuple(e.agg(F.bit_xor(F.xxhash64("_u", "_v")), F.count(F.lit(1))).first())
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # fixpoint is a star per component, centered at the component minimum
    return (
        e.select(F.col("_u").alias("node"), F.col("_v").alias("component"))
        .union(e.select(F.col("_v").alias("node"), F.col("_v").alias("component")))
        .distinct()
    )


def triangle_count(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Exact global triangle count with degree orientation (Suri &
    Vassilvitskii, "Counting Triangles and the Curse of the Last Reducer",
    WWW 2011): each undirected edge is directed from its lower-(degree,
    id) endpoint to the higher, wedges are generated only at each
    triangle's LOWEST-ranked vertex, and a semi-join against the canonical
    edge set closes them. Wedge volume is sum over nodes of out-degree^2,
    and orientation bounds every out-degree by O(sqrt(m)) — the paper's
    fix for the hub-node blowup a naive adjacency join suffers on skewed
    graphs (the "last reducer" that would otherwise hold a celebrity
    node's entire neighborhood squared).

    Input: undirected edges as canonical ``a < b`` pairs, pre-deduped.
    Shuffles: degree agg + two joins keyed on node ids + the wedge-close
    join keyed on (v1, v2); all O(m + wedges). Returns one row:
    n_nodes, n_edges, n_triangles.
    """
    ea, eb = F.col(a), F.col(b)
    # persist the staged frames (r18): unstaged, the plan evaluated the
    # caller's ``edges`` subtree 14 times — deg twice, da/db twice each
    # through deg, oriented once per wedge side (5 edge-evals each), the
    # semi-join right side, and the two scalar counts. For the query-layer
    # callers ``edges`` is an expensive lineitem self-join + distinct, so
    # the re-derivation dominated the whole query. Each staged frame is
    # O(m): edges, node degrees, oriented edges. Cache hygiene is the
    # session owner's (bench/sweep clearCache between entries; the cache
    # manager dedups persists by analyzed plan, so a caller-persisted
    # input is not double-cached).
    edges = edges.persist()
    deg = (
        edges.select(ea.alias("v")).unionAll(edges.select(eb.alias("v")))
        .groupBy("v").agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    # rank = sortable (degree, id) struct; orient edge low -> high
    da = deg.select(F.col("v").alias(a), F.struct(F.col("d"), F.col("v")).alias("_ra"))
    db = deg.select(F.col("v").alias(b), F.struct(F.col("d"), F.col("v")).alias("_rb"))
    oriented = (
        edges.join(da, a).join(db, b)
        .select(
            F.when(F.col("_ra") < F.col("_rb"), ea).otherwise(eb).alias("src"),
            F.when(F.col("_ra") < F.col("_rb"), eb).otherwise(ea).alias("dst"),
        )
        .persist()
    )
    w1 = oriented.select(F.col("src"), F.col("dst").alias("_v1"))
    w2 = oriented.select(F.col("src"), F.col("dst").alias("_v2"))
    wedges = w1.join(w2, "src").filter(F.col("_v1") < F.col("_v2"))
    # left_semi: one closed wedge = one triangle (wedge rows are unique per
    # (center, v1, v2); two wedges sharing (v1, v2) are different triangles
    # and both survive a semi-join)
    closed = wedges.join(
        edges.select(ea.alias("_v1"), eb.alias("_v2")), ["_v1", "_v2"], "left_semi"
    )
    tri = closed.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    n_nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    n_edges = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return n_nodes.crossJoin(n_edges).crossJoin(tri)


def triangle_count_doulion(
    edges: DataFrame, p_bp: int, a: str = "a", b: str = "b"
) -> DataFrame:
    """DOULION sampled triangle count (Tsourakakis, Kang, Miller &
    Faloutsos, KDD 2009): sparsify by keeping each edge independently
    with probability p, run the exact counter on the survivors, scale by
    1/p^3 (each triangle survives with probability p^3). This is the
    published scale path for DENSE graphs, where exact counting's wedge
    volume is Theta(n^3): expected wedge work drops by p^2 and triangle
    work by p^3, while the estimator stays unbiased with variance that
    vanishes for triangle-rich graphs (their Thm 2).

    The coin is a DETERMINISTIC hash gate — first 16 bits of
    md5(a|b) < round(p_bp * 65536 / 10000) — not rand(): reproducible
    under any partitioning/run and cross-engine checkable (the
    samp_deterministic contract). ``p_bp`` is basis points and must
    divide 10000 so the 1/p^3 scale-up (10000/p_bp)^3 is an exact
    integer — the estimate stays in BIGINT arithmetic, bit-stable for
    the differential oracle. Because the gate lives in 16-bit space,
    the EFFECTIVE retention probability is the nearest dyadic fraction
    round(p_bp*65536/10000)/65536 (within 2^-17 of nominal p) while
    the scale-up uses nominal p — a bounded systematic error of at
    most ~3*2^-17/p relative (~0.002% at p=0.2), the deterministic-gate
    price; the estimator is unbiased w.r.t. the effective p.

    Returns one row: n_edges (original), n_edges_sampled,
    n_triangles_sampled, est_triangles.
    """
    if 10000 % p_bp != 0:
        raise ValueError(f"p_bp must divide 10000, got {p_bp}")
    scale = (10000 // p_bp) ** 3
    gate = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(a).cast("string"), F.lit("|"), F.col(b).cast("string")
                )
            ),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    # persist the pre-gate edge set (r18): both the sampled counter and
    # the n_edges scalar consume it; unstaged, the caller's co-occurrence
    # self-join ran twice more on top of triangle_count's internal reuse.
    edges = edges.persist()
    sampled = edges.filter(gate < (p_bp * 65536 + 5000) // 10000)
    tc = triangle_count(sampled, a, b).select(
        F.col("n_edges").alias("n_edges_sampled"),
        F.col("n_triangles").alias("n_triangles_sampled"),
        (F.col("n_triangles") * scale).cast("long").alias("est_triangles"),
    )
    m = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return m.crossJoin(tc)


def label_propagation(
    edges: DataFrame, src: str, dst: str, max_iter: int = 5
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan,
    Albert & Kumara 2007) over undirected ``(src, dst)`` edges: each
    node repeatedly adopts the most frequent label in its closed
    neighborhood (self included — the standard damping against the
    synchronous variant's bipartite oscillation), ties broken by the
    SMALLEST label, so the whole run is deterministic under any
    partitioning. Node ids must be numeric (the argmax tie-break is a
    single max over (count, -label) structs — no per-node sort).

    Returns ``(node, community)`` after ``max_iter`` rounds (LPA has no
    convergence guarantee in general; a fixed round budget is the
    published practice for the synchronous variant). Complexity per
    round: one adjacency⋈labels join (adjacency pre-partitioned on the
    join key once and reused every round — the PageRank transition-reuse
    pattern) plus one (node, label)-keyed count and one node-keyed
    argmax; all shuffles are hash-keyed, bounded by O(edges). Lineage is
    cut with a localCheckpoint every other round.

    Complements connected_components (pure reachability) and
    triangle_count (local density): LPA splits a connected graph into
    dense regions — the community-structure readout.
    """
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = (
        edges.select(F.col(src).alias("_a"), F.col(dst).alias("_b"))
        .filter(
            F.col("_a").isNotNull()
            & F.col("_b").isNotNull()
            & (F.col("_a") != F.col("_b"))
        )
        .distinct()
    )
    nodes = (
        e.select(F.col("_a").alias("_v"))
        .union(e.select("_b"))
        .distinct()
    )
    # closed neighborhood: both directions + self-loop, partitioned once
    # on the label-join key and reused every round
    adj = (
        e.select(F.col("_a").alias("_n"), F.col("_b").alias("_nbr"))
        .union(e.select(F.col("_b"), F.col("_a")))
        .union(nodes.select(F.col("_v"), F.col("_v")))
        .repartition(n_part, "_nbr")
        .sortWithinPartitions("_nbr")
        # persist, NOT localCheckpoint (r18): the checkpointed
        # LogicalRDD drops outputPartitioning/outputOrdering, so every
        # round's join re-shuffled and re-sorted the whole adjacency —
        # the InMemoryRelation keeps both, so each round moves only the
        # node-sized labels frame. Cache hygiene is the session owner's
        # (bench/sweep clearCache between entries).
        .persist()
    )
    labels = nodes.select("_v", F.col("_v").alias("_lbl"))
    for it in range(max_iter):
        # NB: a shuffle_hash hint on the labels side was A/B-measured
        # SLOWER at 10x edges (r18: 26.6 s vs 23.9 s) — the sort-merge
        # plan reuses the checkpointed adjacency's layout; leave the
        # strategy to the planner here.
        votes = (
            adj.join(labels, adj["_nbr"] == labels["_v"])
            .groupBy("_n", "_lbl")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        labels = (
            votes.groupBy("_n")
            .agg(F.max(F.struct(F.col("_c"), (-F.col("_lbl")).alias("_neg"))).alias("_m"))
            .select(F.col("_n").alias("_v"), (-F.col("_m._neg")).alias("_lbl"))
        )
        if it % 2 == 1:
            labels = labels.localCheckpoint(eager=False)
    return labels.select(
        F.col("_v").alias("node"), F.col("_lbl").alias("community")
    )


def kcore(
    edges: DataFrame, k: int, src: str = "a", dst: str = "b", max_iter: int = 20
) -> DataFrame:
    """k-core extraction (Seidman 1983) by synchronous peeling: repeatedly
    delete every vertex whose degree in the SURVIVING subgraph is < k,
    until a fixpoint — what remains is the unique maximal subgraph with
    minimum degree >= k, the standard "dense backbone" cut used to strip
    weakly-attached documents/accounts before community or influence
    analysis (complements label_propagation: LPA partitions, k-core
    filters by local robustness).

    Returns ``(node, core_degree)`` for surviving vertices. Deterministic:
    the fixpoint is unique regardless of peeling order (Seidman), so
    synchronous rounds under any partitioning converge to the same set.

    Scale shape: each round is one degree aggregation plus two hash
    semi-joins, all O(edges) and key-partitioned — no global structure.
    Convergence needs at most |V| rounds in theory but in practice a few
    (each round removes every vertex currently below k, a large fraction
    of the periphery at once); the driver-side loop early-exits on the
    first round that removes nothing, at the cost of one count() action
    per round (a scalar aggregate, not a collect). Lineage is cut with a
    localCheckpoint every round since each round's edge set feeds the
    next."""
    if k < 1:
        raise ValueError(f"kcore: k must be >= 1, got {k}")
    e = (
        edges.select(F.col(src).alias("_a"), F.col(dst).alias("_b"))
        .filter(
            F.col("_a").isNotNull()
            & F.col("_b").isNotNull()
            & (F.col("_a") != F.col("_b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = e.count()
    for _ in range(max_iter):
        if n_edges == 0:
            break
        deg = (
            e.select(F.col("_a").alias("_v"))
            .union(e.select("_b"))
            .groupBy("_v")
            .agg(F.count(F.lit(1)).alias("_d"))
        )
        keep = deg.filter(F.col("_d") >= k).select("_v")
        e2 = (
            e.join(keep.withColumnRenamed("_v", "_a"), "_a", "left_semi")
            .join(keep.withColumnRenamed("_v", "_b"), "_b", "left_semi")
            .localCheckpoint(eager=True)
        )
        n2 = e2.count()
        # each checkpoint pins an executor-cached edge copy for the
        # session; release the superseded round (the bpe.py discipline)
        e.unpersist()
        e = e2
        if n2 == n_edges:
            break
        n_edges = n2
    deg = (
        e.select(F.col("_a").alias("_v"))
        .union(e.select("_b"))
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    return deg.select(
        F.col("_v").alias("node"), F.col("_d").alias("core_degree")
    )
