"""Distributed graph operators — co-occurrence edges, triangle counting,
fixed-point PageRank, and deterministic label propagation.

Complements the connected-components dedup clustering
(``dedup.connected_components``): where CC answers "which items are
transitively linked", triangle counting measures how CLIQUEY the link
structure is (graph clustering coefficient numerator) — a standard
signal for near-duplicate cluster density and recommendation graphs.

The algorithm is the degree-oriented node-iterator: orient every
undirected edge from its lower-(degree, id) endpoint to the higher one,
build wedges only from each node's OUT-edges, and close them against the
oriented edge set.  Orientation caps every out-degree at O(sqrt(m)), so
wedge generation is O(m^1.5) worst-case instead of sum-of-degree^2 —
the difference between a hub node exploding the shuffle and not.  Each
triangle is counted exactly once (its unique lowest-(degree, id) apex
generates it), so the count equals the naive a<b<c enumeration the
oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .caching import checkpoint_rotate as _ckpt_rotate
from .dedup import drop_hot_keys


def _undirected_adj(edges: DataFrame) -> DataFrame:
    """Materialized adjacency list ``(v, n)`` of an undirected ``(lo, hi)``
    edge set (lo < hi per row, no duplicates): both orientations, eagerly
    localCheckpoint-ed — the iterative operators (label_propagation,
    coreness_hindex) join against it every round, and an un-truncated
    lineage would make Catalyst re-analyze the whole build per iteration.
    ONE copy of the edge contract: dedup/self-loop/pre-partitioning
    changes land here or the iterative operators silently diverge."""
    und = edges.select("lo", "hi")
    return (
        und.select(F.col("lo").alias("v"), F.col("hi").alias("n"))
        .unionAll(und.select(F.col("hi").alias("v"), F.col("lo").alias("n")))
        .localCheckpoint(eager=True)
    )


def cooccurrence_edges(
    df: DataFrame,
    group_col: str,
    item_col: str,
    max_items_per_group: int | None = None,
) -> DataFrame:
    """Distinct undirected item-item edges: two items are linked iff they
    co-occur in at least one group.  Output columns ``(lo, hi)`` with
    ``lo < hi``.

    Work per group is quadratic in its distinct items — bounded for
    order-lines-style data (TPC-H orders have <= 7 lines), fatal on
    hostile data (one 100k-item group emits 5e9 pairs and kills the join
    stage).  ``max_items_per_group`` is the valve: groups with more
    distinct items are DROPPED before the self-join, same contract as
    the shingle index's ``max_df`` (a group shared by F items costs
    F^2/2 join rows, so ubiquitous mega-groups carry no edge signal
    worth their cost).  One cheap pre-aggregated count + semi-join —
    the count shuffle carries only (group, n), never the items.  Default
    ``None`` keeps the operator oracle-exact for registered queries on
    the bounded fixtures."""
    pairs = drop_hot_keys(
        df.select(group_col, F.col(item_col).alias("lo")).distinct(),
        [group_col],
        max_items_per_group,
    )
    other = pairs.withColumnRenamed("lo", "hi")
    return (
        pairs.join(other, group_col)
        .where(F.col("lo") < F.col("hi"))
        .select("lo", "hi")
        .distinct()
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Count triangles in an undirected ``(lo, hi)`` edge set (lo < hi
    per row, no duplicates).  Returns one row: ``(n_edges, n_triangles)``.

    Degree-oriented: wedges come only from out-edges under the
    (degree, id) total order, so hub vertices never fan out quadratic
    wedge sets.  The closing membership probe is a semi-join against the
    oriented edges — at scale both the wedge join (on the apex) and the
    probe (on the wedge endpoints) are plain hash shuffles."""
    deg = (
        edges.select(F.col("lo").alias("v"))
        .unionAll(edges.select(F.col("hi").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = (
        edges.join(deg.withColumnRenamed("v", "lo"), "lo")
        .withColumnRenamed("deg", "dlo")
        .join(deg.withColumnRenamed("v", "hi"), "hi")
        .withColumnRenamed("deg", "dhi")
    )
    # orient each edge from the lower (deg, id) endpoint to the higher
    lo_first = (F.col("dlo") < F.col("dhi")) | (
        (F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))
    )
    oriented = e.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("src"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("dst"),
        F.when(lo_first, F.col("dlo")).otherwise(F.col("dhi")).alias("dsrc"),
        F.when(lo_first, F.col("dhi")).otherwise(F.col("dlo")).alias("ddst"),
    )
    o1 = oriented.select(
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.col("ddst").alias("dv"),
    )
    o2 = oriented.select(
        F.col("src").alias("u"),
        F.col("dst").alias("w"),
        F.col("ddst").alias("dw"),
    )
    # wedge (u; v, w) with v before w under the same (deg, id) order, so
    # the closing edge, if present, is oriented exactly v -> w
    wedges = o1.join(o2, "u").where(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closed = wedges.join(
        oriented.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        ["v", "w"],
        "left_semi",
    )
    n_tri = closed.groupBy().agg(F.count(F.lit(1)).alias("n_triangles"))
    n_e = edges.groupBy().agg(F.count(F.lit(1)).alias("n_edges"))
    return n_e.crossJoin(n_tri).select(
        F.col("n_edges").cast("bigint"),
        F.col("n_triangles").cast("bigint"),
    )



# Per-round vertex-state frames (labels, ranks, distances, corenesses)
# are |V|-sized while the checkpointed adjacency they join is 2|E|-sized.
# Below this vertex count the state side carries an explicit broadcast
# hint, so every iteration joins WITHOUT exchanging (or sorting) the
# adjacency — AQE cannot make that call itself here because checkpointed
# RDD scans report unknown sizes, and the pre-execution plan was a full
# SortMergeJoin with both sides exchanged, per round.  2M rows of two
# longs is ~32 MB broadcast — executor-safe; bigger graphs keep the
# unhinted shuffle join (AQE still converts at runtime when actual sizes
# allow).  One count job per operator call prices the gate.
_BCAST_VERTS_MAX = 2_000_000


def _maybe_bcast(df: DataFrame, n_rows: int) -> DataFrame:
    return F.broadcast(df) if n_rows <= _BCAST_VERTS_MAX else df


def label_propagation(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007's community
    detection) made deterministic: every vertex starts as its own label;
    each round every vertex adopts the most frequent label among its
    NEIGHBORS (its own label does not vote), ties to the SMALLEST label.
    Run for a FIXED number of rounds over an undirected ``(lo, hi)`` edge
    set (lo < hi per row, no duplicates); returns ``(v, label)``.

    The deterministic argmax ((count DESC, label ASC) — classic LPA
    breaks ties randomly, which no oracle could gate) makes the label
    matrix bit-identical across partitionings and engines; sync updates
    can oscillate on bipartite structure, which a fixed iteration count
    renders moot (the contract is the round-T state, not a fixpoint).

    Scale shape: each round is one hash join of labels onto the
    checkpointed adjacency list plus one (v, label) count shuffle and a
    per-vertex min(struct) argmax — all-integer, map-side combinable.
    Labels localCheckpoint per round with superseded-block release (the
    pagerank discipline); the final round stays un-truncated so callers
    see the real join+agg plan."""
    adj = _undirected_adj(edges)
    labels = (
        adj.select("v").distinct().select("v", F.col("v").alias("l"))
        .localCheckpoint(eager=True)
    )
    n_verts = labels.count()  # prices the per-round broadcast gate
    prev_ckpt: DataFrame | None = labels
    for i in range(iterations):
        if i:
            labels = prev_ckpt = _ckpt_rotate(labels, prev_ckpt)
        nbr = adj.join(
            _maybe_bcast(labels.select(F.col("v").alias("n"), "l"), n_verts), "n"
        )
        cnt = nbr.groupBy("v", "l").agg(F.count(F.lit(1)).alias("c"))
        # argmax by (count desc, label asc) as ONE min(struct) aggregate —
        # no per-vertex window, stays map-side combinable
        labels = cnt.groupBy("v").agg(
            F.min(F.struct((-F.col("c")).alias("nc"), F.col("l").alias("l")))[
                "l"
            ].alias("l")
        )
    return labels.select("v", F.col("l").alias("label"))


def coreness_hindex(edges: DataFrame, rounds: int = 4) -> DataFrame:
    """Distributed k-core decomposition by h-index iteration (Montresor,
    De Pellegrini & Miorandi 2011, "Distributed k-core decomposition"):
    every vertex starts at its degree; each round it replaces its value
    with the H-index of its neighbors' values (the largest h such that
    at least h neighbors hold value >= h).  The sequence is monotone
    non-increasing and converges to the exact coreness; run for a FIXED
    number of rounds over an undirected ``(lo, hi)`` edge set (lo < hi
    per row, no duplicates) and return ``(v, coreness)`` — the round-T
    state (the labelprop contract: a fixed-round result an oracle can
    pin, upper-bounding true coreness until convergence).

    The per-vertex H-index is ``max(least(rank, value))`` over neighbor
    values sorted descending — deterministic even under rank ties,
    because tied neighbors carry equal values, so the (rank, value)
    multiset is order-independent.

    Scale shape: each round is one hash join of values onto the
    checkpointed adjacency list, a per-vertex descending rank (window
    partitioned by vertex — hash-partitioned, no global sort, bounded by
    max degree), and a map-side-combinable max aggregate; values
    localCheckpoint per round with superseded-block release.  Unlike
    single-k peel loops (whose survivor set collapses all-or-nothing on
    uniform random graphs), the full decomposition is informative on any
    degree distribution."""
    from pyspark.sql import Window

    adj = _undirected_adj(edges)
    c = adj.groupBy("v").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(eager=True)
    n_verts = c.count()  # prices the per-round broadcast gate
    prev_ckpt: DataFrame | None = c
    for i in range(rounds):
        if i:  # pagerank's rotation discipline; final round un-truncated
            c = prev_ckpt = _ckpt_rotate(c, prev_ckpt)
        nbr = adj.join(_maybe_bcast(c.select(F.col("v").alias("n"), "c"), n_verts), "n")
        rn = F.row_number().over(
            Window.partitionBy("v").orderBy(F.col("c").desc())
        )
        c = (
            nbr.select("v", "c", rn.alias("rn"))
            .groupBy("v")
            .agg(F.max(F.least("rn", "c")).alias("c"))
        )
    return c.select("v", F.col("c").cast("bigint").alias("coreness"))


_BFS_INF = 1 << 40  # unreached sentinel; additions over <= rounds stay finite


def bfs_hops(edges: DataFrame, seeds: DataFrame, rounds: int = 4) -> DataFrame:
    """Multi-source BFS hop distances over an undirected ``(lo, hi)`` edge
    set (lo < hi per row, no duplicates), run for a FIXED number of
    rounds.  ``seeds`` is a DataFrame with a single ``v`` column; returns
    ``(v, hops)`` for every vertex reached within ``rounds`` hops (the
    distance-to-nearest-seed label propagation pipelines use for
    trusted-source proximity scoring).

    Bellman-Ford-shaped relaxation, all-integer: every vertex starts at 0
    (seed) or a finite sentinel, and each round takes
    ``min(own, min_neighbor + 1)``.  After R rounds the value is the exact
    hop distance for every vertex within R hops — monotone, order-
    independent, engine-exact, so an unrolled SQL CTE hash-gates it.
    Only vertices appearing in the edge set participate (an isolated
    seed has no adjacency row to relax).

    Scale shape: each round is one hash join of distances onto the
    checkpointed adjacency list plus one min-shuffle (map-side
    combinable) and a left join back to the vertex distances — the
    pagerank iteration cost model; distances localCheckpoint per round
    with superseded-block release, final round un-truncated."""
    adj = _undirected_adj(edges)
    d = (
        adj.select("v")
        .distinct()
        # distinct defensively: a duplicate seed row would fork two
        # dist rows for its vertex through every round's left join and
        # silently duplicate the output
        .join(seeds.select("v").distinct().select("v", F.lit(0).alias("__s")), "v", "left")
        .select(
            "v",
            F.coalesce(F.col("__s").cast("long"), F.lit(_BFS_INF).cast("long")).alias(
                "dist"
            ),
        )
        .localCheckpoint(eager=True)
    )
    n_verts = d.count()  # prices the per-round broadcast gate
    prev_ckpt: DataFrame | None = d
    for i in range(rounds):
        if i:  # pagerank's rotation discipline; final round un-truncated
            d = prev_ckpt = _ckpt_rotate(d, prev_ckpt)
        nd = (
            adj.join(_maybe_bcast(d.select(F.col("v").alias("n"), "dist"), n_verts), "n")
            .groupBy("v")
            .agg((F.min("dist") + F.lit(1)).alias("nd"))
        )
        d = d.join(_maybe_bcast(nd, n_verts), "v", "left").select(
            "v", F.least(F.col("dist"), F.coalesce("nd", F.lit(_BFS_INF))).alias("dist")
        )
    return d.where(F.col("dist") < _BFS_INF).select(
        "v", F.col("dist").cast("bigint").alias("hops")
    )


def pagerank(
    edges: DataFrame, iterations: int = 3, damping_pct: int = 85
) -> DataFrame:
    """Fixed-point integer PageRank over a directed ``(src, dst)`` edge
    set, run for a FIXED number of iterations.  Returns
    ``(v, rank_micro)`` for every vertex that appears in the edge set.

    All arithmetic is integer — rank in 1e-6 units (bigint), the per-edge
    contribution is ``rank div out_degree`` (truncating division), and the
    damping update is ``(100-d)*10^4 + (d * sum) div 100`` — so sums are
    order-independent and the result is bit-identical across
    partitionings AND engines, which lets an unrolled SQL CTE hash-gate
    it exactly (float PageRank never could).  Mass at dangling vertices
    (no out-edges) is dropped, the common simplification; a symmetrized
    co-occurrence graph has none.

    Scale shape: each iteration is one hash join of ranks to the
    degree-annotated edge list on src plus one sum-shuffle on dst —
    ``iterations`` is a constant, and pre-partitioning edges and ranks on
    vertex id makes every round's join co-located on a cluster.  Ranks
    are localCheckpoint-ed per round and the edge list once (the
    connected_components lineage-truncation discipline — each round
    references the previous ranks, so an unbroken lineage grows a plan
    Catalyst re-analyzes from scratch every iteration).
    """
    e = edges.select("src", "dst").distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e_deg = e.join(deg, "src").localCheckpoint(eager=True)
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    base = (100 - damping_pct) * 10_000
    n_verts = verts.count()  # checkpointed above; prices the broadcast gate
    ranks = verts.select("v", F.lit(1_000_000).cast("bigint").alias("r"))
    prev_ckpt: DataFrame | None = None
    for i in range(iterations):
        if i:  # truncate the PREVIOUS round's lineage before reuse; the
            # final round stays un-truncated so callers see (and plan-test)
            # the real join+agg shape instead of a checkpoint scan.
            # checkpoint_rotate frees the superseded round's blocks so
            # storage is O(1) in iterations (the newest checkpoint stays:
            # the returned plan reads it)
            ranks = prev_ckpt = _ckpt_rotate(ranks, prev_ckpt)
        contrib = (
            e_deg.join(_maybe_bcast(ranks, n_verts), e_deg["src"] == ranks["v"])
            .groupBy(F.col("dst").alias("v"))
            .agg(F.sum(F.expr("r div deg")).alias("s"))
        )
        ranks = verts.join(_maybe_bcast(contrib, n_verts), "v", "left").select(
            "v",
            (F.lit(base) + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100"))
            .cast("bigint")
            .alias("r"),
        )
    return ranks.select("v", F.col("r").alias("rank_micro"))
