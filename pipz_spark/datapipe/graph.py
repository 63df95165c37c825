"""Distributed PageRank — the iterative DISTRIBUTED-state machine
(Brin & Page 1998; the Pregel shape: per-node state lives in the
cluster, never on the driver).

The repo's other iterative machines (``kmeans_embeddings``,
``train_quality_classifier``) carry tiny state between corpus passes
— k × dims or n_buckets numbers — so the state rides the PLAN as
literals and each pass is join-free. PageRank is the opposite regime
and completes the taxonomy: the state is one number PER NODE, which
at 100 TB is billions of rows — it can never collect to the driver
or broadcast. The only correct shape is Pregel's: state stays a
DataFrame keyed by node, and each iteration is

  1. ``contrib = edges ⋈ ranks on src`` (a co-partitionable
     equi-join: both sides hash on the node key; persist the edges
     pre-partitioned by src — or bucket them — and the edge side
     never reshuffles across iterations),
  2. ``groupBy(dst).sum(contrib)`` — map-side partial aggregation
     collapses each partition's contributions before the shuffle, so
     the exchange carries at most (partitions × distinct dst) rows,
  3. a left join back onto the node list to apply damping (nodes
     with no in-edges get the teleport base).

Nothing is ever driver-materialized; the returned plan is lazy.
Lineage grows linearly with ``iters`` — for long runs pass
``checkpoint_every`` (≈10), which `localCheckpoint()`s the ranks
frame at that cadence and truncates the analyzer plan, the standard
Spark iterative-algorithm discipline. The declared query uses 2
iterations with no checkpoint so it stays a pure plan the SQL oracle
can replay.

Every arithmetic step is integer-exact so the replay is bit-for-bit
under ANY partitioning or aggregation order (no float sums — the
kmeans discipline, here with no quantization residual at all):

  - ranks are BIGINT, initialized to ``init_q`` per node;
  - a node's per-edge contribution is ``rank_q DIV outdeg`` (integer
    division — the truncated remainder deterministically evaporates,
    at most outdeg−1 units per node per iteration);
  - the damped update is ``base + (Σ contribs · num) DIV den`` with
    damping = num/den (default 17/20 = 0.85) and
    ``base = init_q · (den − num) DIV den`` — all BIGINT. To keep
    the INTERMEDIATE inside int64 the engine evaluates it in the
    algebraically identical divide-first form
    ``(s DIV den)·num + ((s % den)·num) DIV den`` (exact for s ≥ 0:
    write s = q·den + r; then (s·num) DIV den = q·num +
    (r·num) DIV den), so no value in the plan ever exceeds
    ``Σ contribs`` + base — multiplying the full sum by ``num``
    first would overflow a star graph's hub at ``num×`` lower mass,
    silently wrapping under non-ANSI Spark.

Overflow bound: with the divide-first update the largest value in
the plan is a node's in-sum, ≤ total mass ≈ n_nodes · init_q, so
choose ``init_q ≤ 2^62 / n_nodes`` — factor-2 headroom below
int64 — (the default 10^12 is safe to ~4.6 M nodes; at 10^9 nodes
use init_q = 10^9 — rank resolution scales down with it, which is
exactly how fixed-point PageRank is deployed).

Dangling nodes (outdeg = 0) contribute nothing — their mass
evaporates each iteration (the standard "remove dangling" variant;
ranks remain comparable, not a probability distribution). Nodes set
= distinct sources ∪ distinct destinations.

Reference parity: the reference engine has no graph operator — this
belongs to the repo's LLM-data-pipeline surface (graph-based quality
propagation over hyperlink/citation graphs is a published curation
signal, and the near-dup pair graphs this repo already builds are
natural edge inputs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ord_lt(d1: Column, n1: Column, d2: Column, n2: Column) -> Column:
    """The degree-orientation total order (deg, node): strict less."""
    return (d1 < d2) | ((d1 == d2) & (n1 < n2))


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    init_q: int = 1_000_000_000_000,
    damping: tuple[int, int] = (17, 20),
    checkpoint_every: int | None = None,
    seeds: DataFrame | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list; returns
    (node, rank_q BIGINT, outdeg BIGINT) after ``iters`` damped
    iterations. ``rank_q / init_q`` is the rank in units of the
    initial per-node mass. Multi-edges contribute multiply (weight
    by multiplicity); pass a de-duplicated edge list for the simple
    graph. ``checkpoint_every=N`` localCheckpoints the ranks frame
    after every N iterations, truncating lineage for long runs
    (values are identical with or without it).

    ``weight_col`` switches to WEIGHTED PageRank (Xing & Ghorbani
    2004): a node splits its mass proportionally to positive integer
    edge weights instead of evenly — per edge ``(rank·w) DIV wsum``
    evaluated divide-first (``(rank DIV wsum)·w +
    ((rank % wsum)·w) DIV wsum``, exact for rank, w ≥ 0), and the
    returned ``outdeg`` becomes the node's out-STRENGTH Σw. Edges
    with NULL or non-positive weight are dropped (a zero weight
    carries no mass; a negative one would corrupt the distribution).
    Extra overflow term: per node, wsum · max-edge-weight must stay
    under 2^62 — trivially true for multiplicity-style weights.

    ``seeds`` switches to PERSONALIZED PageRank (Page et al. 1998
    §6's personalization vector; the seed-set trust-propagation use
    is TrustRank, Gyöngyi et al. 2004 — the published corpus-quality
    signal: mass injected at trusted sources flows along links, and
    a page's rank is its proximity to trust): a one-column frame of
    node ids (column ``node``) that receive the teleport base and
    the initial mass; every other node starts at 0 and earns rank
    only through in-links. The seed frame joins once onto the node
    table (broadcast-sized seed sets broadcast; corpus-sized seed
    sets hash-join) — the iteration shape is unchanged.
    Deterministic and integer-exact end to end — see the module
    docstring."""
    if iters < 0:
        raise ValueError(f"need iters >= 0, got {iters}")
    num, den = damping
    if not (0 < num < den):
        raise ValueError(f"damping must be 0 < num < den, got {num}/{den}")
    if init_q <= 0:
        raise ValueError(f"need init_q > 0, got {init_q}")
    if checkpoint_every is not None and checkpoint_every <= 0:
        raise ValueError(f"need checkpoint_every > 0, got {checkpoint_every}")
    base = (init_q * (den - num)) // den

    # No .persist() on the per-iteration inputs, DELIBERATELY: every
    # consumer of the edge list and node table sits behind a shuffle
    # (the contribution join and the damping join both hash on the
    # node key), and Catalyst's ReuseExchange deduplicates identical
    # exchanges across iterations of the one composed plan — the
    # shuffle files ARE the materialization, read back per iteration
    # (visible as shuffle-read > shuffle-write in the stress rig). A
    # persist on top of that pays a second full materialization and
    # breaks stage pipelining: measured 5.5 s vs 1.7 s per run on the
    # sf0.1 declared query, and neutral at the 117M-edge 100× rig.
    wcols = (
        []
        if weight_col is None
        else [F.col(weight_col).cast("long").alias("_w")]
    )
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"), *wcols
    ).where(F.col(src_col).isNotNull() & F.col(dst_col).isNotNull())
    if weight_col is not None:
        e = e.where(F.col("_w").isNotNull() & (F.col("_w") > 0))
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    mass = F.count(F.lit(1)) if weight_col is None else F.sum("_w")
    deg = e.groupBy("_src").agg(mass.alias("outdeg"))
    ndeg = nodes.join(deg, nodes["node"] == deg["_src"], "left").select(
        "node", F.coalesce(F.col("outdeg"), F.lit(0)).cast("long").alias("outdeg")
    )
    if seeds is None:
        ndeg = ndeg.withColumn("_base", F.lit(base).cast("long"))
    else:
        sd = seeds.select(F.col("node")).distinct().withColumn(
            "_is_seed", F.lit(True)
        )
        # keep the seed flag itself for the rank init below: base
        # floors to 0 when init_q·(den−num) < den (damping near 1
        # with a small init_q), and inferring seed-ness from
        # ``_base > 0`` would then zero the seeds' initial mass too
        ndeg = ndeg.join(sd, "node", "left").select(
            "node",
            "outdeg",
            F.coalesce(F.col("_is_seed"), F.lit(False)).alias("_is_seed"),
            F.when(F.col("_is_seed"), F.lit(base))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("_base"),
        )
    ranks = ndeg.withColumn(
        "rank_q",
        F.when(F.col("_is_seed"), F.lit(init_q)).otherwise(F.lit(0)).cast("long")
        if seeds is not None
        else F.lit(init_q).cast("long"),
    )

    for it in range(iters):
        if weight_col is None:
            contrib = e.join(
                ranks.where(F.col("outdeg") > 0).select(
                    F.col("node").alias("_n"),
                    F.expr("rank_q DIV outdeg").alias("_c"),
                ),
                F.col("_src") == F.col("_n"),
            ).select("_dst", "_c")
        else:
            # proportional split, divide-first (see docstring): the
            # per-edge share (rank·w) DIV wsum without forming rank·w
            contrib = e.join(
                ranks.where(F.col("outdeg") > 0).select(
                    F.col("node").alias("_n"),
                    F.col("rank_q").alias("_rq"),
                    F.col("outdeg").alias("_ws"),
                ),
                F.col("_src") == F.col("_n"),
            ).select(
                "_dst",
                F.expr(
                    "(_rq DIV _ws) * _w + ((_rq % _ws) * _w) DIV _ws"
                ).alias("_c"),
            )
        insum = contrib.groupBy("_dst").agg(F.sum("_c").alias("_s"))
        # divide-first damping: (s·num) DIV den without ever forming
        # s·num — the intermediate stays ≤ s (see module docstring's
        # overflow bound)
        ranks = (
            ndeg.join(insum, ndeg["node"] == insum["_dst"], "left")
            .select(
                "node",
                "outdeg",
                "_base",
                (
                    F.col("_base")
                    + F.expr(
                        f"(coalesce(_s, 0L) DIV {den}L) * {num}L"
                        f" + ((coalesce(_s, 0L) % {den}L) * {num}L) DIV {den}L"
                    )
                ).alias("rank_q"),
            )
        )
        if checkpoint_every is not None and (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            ranks = ranks.localCheckpoint()

    return ranks.select("node", "rank_q", "outdeg")


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over an UNDIRECTED graph given as an
    edge list (either or both directions; duplicates and self-loops
    ignored) — the node-iterator-with-degree-orientation method
    (Schank & Wagner 2005; the MapReduce formulation is Suri &
    Vassilvitskii 2011's "Counting triangles and the curse of the
    last reducer", which exists precisely to kill the skewed-hub
    wedge explosion this implementation avoids). Returns one row per
    node that closes at least one triangle: (node, triangles BIGINT).

    The machine: canonicalize to u < v pairs → per-node degree →
    orient every edge from its lower endpoint to its higher endpoint
    under the TOTAL order (degree, node) → wedges are the self-join
    of the oriented list on the center ``a`` with ord(b) < ord(c) →
    a wedge closes iff the oriented edge (b, c) exists (orientation
    respects the order, so only ONE direction need be probed).
    Exact integer counting, deterministic under any partitioning.

    Why this survives 100 TB: a hub of degree D generates C(D, 2)
    wedges under naive node-iteration — the "last reducer" that
    never finishes. Orientation caps every node's OUT-degree at
    O(√m) (a node with out-degree t has t higher-ordered neighbors
    each of degree ≥ its own, so t² ≤ 2m), bounding total wedges at
    m^{3/2} regardless of skew, with plain equi-join + filter shapes
    throughout (never a cross join). The closing probe is another
    equi-join on the (b, c) pair. Both joins shuffle skinny
    (node, node, deg) rows only.

    Reference parity: no graph operator in the reference engine —
    LLM-data-pipeline surface (triangle density over near-dup pair
    graphs separates template cliques from chance collisions)."""
    e = edges.select(
        F.col(src_col).alias("_u"), F.col(dst_col).alias("_v")
    ).where(
        F.col(src_col).isNotNull()
        & F.col(dst_col).isNotNull()
        & (F.col(src_col) != F.col(dst_col))
    )
    und = e.select(
        F.least("_u", "_v").alias("u"), F.greatest("_u", "_v").alias("v")
    ).distinct()
    deg = (
        und.select(F.col("u").alias("n"))
        .union(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    ed = und.join(du, "u").join(dv, "v")
    lo_first = _ord_lt(F.col("du"), F.col("u"), F.col("dv"), F.col("v"))
    o = ed.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias("dhi"),
    )
    w1 = o.select(
        F.col("lo").alias("a"), F.col("hi").alias("b"), F.col("dhi").alias("db")
    )
    w2 = o.select(
        F.col("lo").alias("a2"), F.col("hi").alias("c"), F.col("dhi").alias("dc")
    )
    wedges = w1.join(
        w2,
        (F.col("a") == F.col("a2"))
        & _ord_lt(F.col("db"), F.col("b"), F.col("dc"), F.col("c")),
    ).select("a", "b", "c")
    closing = o.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    tri = wedges.join(closing, ["b", "c"], "leftsemi")
    per_node = (
        tri.select(F.col("a").alias("node"))
        .union(tri.select(F.col("b").alias("node")))
        .union(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return per_node


def propagate_min_labels(
    edges: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Synchronous min-label propagation over an undirected graph —
    the Pregel connected-components/label-propagation machine
    (Kang et al. 2009 HADI/PEGASUS formulation; the community-label
    variant is Raghavan et al. 2007 made deterministic by replacing
    the random tie-break with MIN). Returns (node, label) after
    ``iters`` rounds: every node carries the smallest node id within
    ``iters`` hops, so once ``iters`` reaches the graph diameter the
    labels ARE the connected components.

    This completes the Pregel aggregation taxonomy next to
    ``pagerank``: same join → aggregate → join iteration shape, but
    the merge is IDEMPOTENT MIN over an ordered domain instead of an
    additive sum — the convergence argument (labels only ever
    decrease, fixed point = per-component minimum) and the exchange
    bound (map-side combine collapses each partition to one candidate
    label per destination) both come from idempotence. The repo's
    driver-side union-find (``dedup.dedup_clusters``) stays the right
    tool below its documented edge cap; THIS is the shape that
    replaces it when the pair graph itself is corpus-sized — no
    driver state at any scale, ``checkpoint_every`` truncating
    lineage exactly as in ``pagerank``.

    Deterministic and engine-exact: MIN over the node id's natural
    ordering, no arithmetic at all — any engine replays it with
    ``iters`` rounds of join + GROUP BY MIN."""
    if iters < 0:
        raise ValueError(f"need iters >= 0, got {iters}")
    if checkpoint_every is not None and checkpoint_every <= 0:
        raise ValueError(f"need checkpoint_every > 0, got {checkpoint_every}")
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).where(F.col(src_col).isNotNull() & F.col(dst_col).isNotNull())
    sym = e.union(e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d")))
    nodes = sym.select(F.col("_s").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node"))

    for it in range(iters):
        nbr = sym.join(
            labels.select(F.col("node").alias("_n"), F.col("label").alias("_l")),
            F.col("_s") == F.col("_n"),
        ).select(F.col("_d").alias("node"), F.col("_l").alias("label"))
        labels = (
            nbr.union(labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        if checkpoint_every is not None and (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            labels = labels.localCheckpoint()

    return labels


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Iterative k-core peeling (Seidman 1983; the distributed
    peel-until-stable formulation is Montresor et al. 2013): each
    round drops every node whose CURRENT degree is below ``k`` and
    the edges touching it, exposing the next layer to peel. Returns
    (node, degree BIGINT) — every surviving node of the undirected
    simple graph after ``rounds`` peels, with its degree in the
    peeled subgraph. Once a round removes nothing the result IS the
    k-core (the unique maximal subgraph of min-degree ≥ k — dense
    template farms in a near-dup pair graph, hub communities in a
    co-purchase graph); ``rounds`` bounds work exactly like
    ``propagate_min_labels``'s ``iters`` bounds the component hops,
    and the peel sequence is deterministic (synchronous rounds), so
    any engine replays it as ``rounds`` join+filter layers.

    The third Pregel-taxonomy member next to pagerank (additive sum)
    and min-labels (idempotent min): here the per-round aggregate is
    a degree COUNT and the state update is a FILTER — each round is
    one map-side-combined count plus two semi-joins, O(edges) rows
    per round, no driver state ever."""
    if k < 0:
        raise ValueError(f"need k >= 0, got {k}")
    if rounds < 0:
        raise ValueError(f"need rounds >= 0, got {rounds}")
    if checkpoint_every is not None and checkpoint_every <= 0:
        raise ValueError(f"need checkpoint_every > 0, got {checkpoint_every}")
    e = edges.select(
        F.col(src_col).alias("_u"), F.col(dst_col).alias("_v")
    ).where(
        F.col(src_col).isNotNull()
        & F.col(dst_col).isNotNull()
        & (F.col(src_col) != F.col(dst_col))
    )
    und = e.select(
        F.least("_u", "_v").alias("u"), F.greatest("_u", "_v").alias("v")
    ).distinct()
    cur = und.select(F.col("u").alias("s"), F.col("v").alias("d")).union(
        und.select(F.col("v").alias("s"), F.col("u").alias("d"))
    )
    for r in range(rounds):
        keep = (
            cur.groupBy("s")
            .agg(F.count(F.lit(1)).alias("_c"))
            .where(F.col("_c") >= k)
            .select("s")
        )
        cur = cur.join(keep, "s", "leftsemi").join(
            keep.select(F.col("s").alias("d")), "d", "leftsemi"
        )
        if checkpoint_every is not None and (r + 1) % checkpoint_every == 0 and r + 1 < rounds:
            cur = cur.localCheckpoint()
    return cur.groupBy("s").agg(F.count(F.lit(1)).alias("degree")).select(
        F.col("s").alias("node"), "degree"
    )


__all__ = ["kcore_peel", "pagerank", "propagate_min_labels", "triangle_count"]
