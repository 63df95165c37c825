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

import itertools
import threading

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# serializes _star_contraction's session-conf save/set/restore window
# (see the comment at its use site)
_STAR_CONF_LOCK = threading.Lock()


def _ord_lt(d1: Column, n1: Column, d2: Column, n2: Column) -> Column:
    """The degree-orientation total order (deg, node): strict less."""
    return (d1 < d2) | ((d1 == d2) & (n1 < n2))


def _directed_front(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    out: tuple[str, str] = ("_src", "_dst"),
    extra: tuple = (),
) -> DataFrame:
    """The ONE directed-graph ingestion contract for the whole family
    (r15 verdict ask: pagerank / hits / kcore / connected_components
    each restated their own NULL/self-loop/multi-edge choices — this
    helper states them once):

    - NULL-endpoint edges are DROPPED, always: a half-specified edge
      carries no adjacency information, and per-operator divergence
      here is exactly what made the r15 CC paths disagree before the
      uniform WHERE.
    - self-loops and multi-edges are KEPT: what they MEAN is the
      operator's call, made downstream of this front — the link
      family (pagerank/hits) counts multiplicity as mass/score, the
      simple-graph family (:func:`_canonical_undirected`, kcore)
      erases both with its self-loop filter + canonical distinct,
      and CC keeps self-loops because they register a node.

    ``extra`` carries operator-specific payload columns (pagerank's
    weight) through the same projection so the scan reads once."""
    a, b = out
    return edges.select(
        F.col(src_col).alias(a), F.col(dst_col).alias(b), *extra
    ).where(F.col(src_col).isNotNull() & F.col(dst_col).isNotNull())


def _node_universe(e: DataFrame, a: str = "_src", b: str = "_dst") -> DataFrame:
    """The (node) universe of a directed edge frame — both endpoint
    columns, distinct. Shared by the link family's final zero-fill
    joins and the rank initializers."""
    return (
        e.select(F.col(a).alias("node"))
        .union(e.select(F.col(b).alias("node")))
        .distinct()
    )


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
    tol: int | None = None,
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

    ``tol`` adds CONVERGENCE early exit for production runs that
    don't know ``iters`` up front: after each iteration the L1 rank
    delta Σ|rank − prev_rank| (exact BIGINT, in rank_q units) is
    computed and the loop stops once delta ≤ tol; ``iters`` becomes
    the round BUDGET. Cost note: convergence checking is inherently
    eager — each iteration `localCheckpoint`s the ranks frame
    (lineage truncation comes free) and the driver reads ONE number
    per round (the classifier's bounded-collect discipline), so the
    returned frame is materialized rather than a pure lazy plan.
    The early-stopped result is IDENTICAL to running with
    iters = the stopping round (behavioral pytest). With
    tol = init_q DIV 10^6 (≈1e-6 relative) real graphs stop in
    10–30 rounds. Deterministic and integer-exact end to end — see
    the module docstring."""
    if iters < 0:
        raise ValueError(f"need iters >= 0, got {iters}")
    num, den = damping
    if not (0 < num < den):
        raise ValueError(f"damping must be 0 < num < den, got {num}/{den}")
    if init_q <= 0:
        raise ValueError(f"need init_q > 0, got {init_q}")
    if checkpoint_every is not None and checkpoint_every <= 0:
        raise ValueError(f"need checkpoint_every > 0, got {checkpoint_every}")
    if tol is not None and tol < 0:
        raise ValueError(f"need tol >= 0, got {tol}")
    base = (init_q * (den - num)) // den

    if tol is None and checkpoint_every is None and iters <= _PR_SQL_MAX_ITERS:
        # The pure-lazy path (every declared query) builds its whole
        # machine — ingestion front, node universe, degree table,
        # iters × (contribution join + in-sum + damping join) — as
        # ONE static SQL parse over a temp view instead of ~60-80
        # fluent-API operators: a probe put the builders' pure
        # PYTHON-side plan construction at 0.3-0.5 s per call (py4j
        # round-trips, the star-loop lesson of r16 applied to the
        # rank family, r16 verdict ask #4). The SQL is the exact
        # algebra of the loop below, verified oracle-exact at both
        # SFs. Bounded to small iters: a deep WITH chain trips the
        # analyzer's Resolution iteration cap (measured at iters=60),
        # while the fluent loop resolves incrementally — long runs
        # (which should pass checkpoint_every anyway) and the eager
        # tol/checkpoint modes keep the DataFrame form.
        return _pagerank_sql(
            edges, iters, src_col, dst_col, init_q, num, den, base,
            seeds, weight_col,
        )

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
        ()
        if weight_col is None
        else (F.col(weight_col).cast("long").alias("_w"),)
    )
    e = _directed_front(edges, src_col, dst_col, extra=wcols)
    if weight_col is not None:
        e = e.where(F.col("_w").isNotNull() & (F.col("_w") > 0))
    nodes = _node_universe(e)
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

    if tol is not None:
        # convergence mode is eager by nature: pin the init frame so
        # every delta join reads materialized rows, not a replayed
        # lineage
        ranks = ranks.localCheckpoint()

    _converged = tol is None or iters == 0
    for it in range(iters):
        ranks_prev = ranks
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
        if tol is not None:
            # one action per round, ONE number to the driver: exact
            # BIGINT L1 delta vs the previous (checkpointed) ranks
            prev = ranks_prev.select(
                "node", F.col("rank_q").alias("_prev")
            )
            ranks = ranks.localCheckpoint()
            delta = (
                ranks.join(prev, "node")
                .agg(F.sum(F.abs(F.col("rank_q") - F.col("_prev"))))
                .first()[0]
            )
            # delta is None ⟺ the node frame is empty (SUM over zero
            # rows) — the fixpoint holds trivially; without this an
            # empty graph burned the whole budget at one
            # checkpoint+collect per round (r15 advice)
            if delta is None or delta <= tol:
                _converged = True
                break
        elif checkpoint_every is not None and (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            ranks = ranks.localCheckpoint()

    if not _converged:
        # the iters budget ran out before delta <= tol: the returned
        # frame is a valid PageRank iterate but NOT a declared
        # fixpoint, and callers could not previously tell the two
        # apart (r15 advice). A warning (not an exception) keeps the
        # documented budget semantics while surfacing the state.
        import warnings

        warnings.warn(
            f"pagerank(tol={tol}) exhausted its iters={iters} budget "
            "before converging; the result is the last iterate, not a "
            "fixpoint — raise iters or tol",
            RuntimeWarning,
            stacklevel=2,
        )
    return ranks.select("node", "rank_q", "outdeg")


_PR_VIEW_IDS = itertools.count()

# SQL-parse path bound: a WITH chain past ~8 iterations trips the
# analyzer's Resolution iteration cap (each CTE reference re-resolves
# its definition), while the fluent loop resolves incrementally
_PR_SQL_MAX_ITERS = 8


def _pagerank_sql(
    edges: DataFrame,
    iters: int,
    src_col: str,
    dst_col: str,
    init_q: int,
    num: int,
    den: int,
    base: int,
    seeds: DataFrame | None,
    weight_col: str | None,
) -> DataFrame:
    """pagerank()'s lazy path as one SQL parse — the IDENTICAL
    algebra of the DataFrame loop (same ingestion front, same
    divide-first damping chains, same left joins), emitted as a WITH
    chain and parsed once. spark.sql() analyzes eagerly, so the temp
    views are dropped before returning and the result stays a plain
    lazy frame."""
    spark = edges.sparkSession
    tag = next(_PR_VIEW_IDS)
    ev = f"__pipz_pr_e_{tag}"
    edges.createOrReplaceTempView(ev)
    views = [ev]
    s, d = f"`{src_col}`", f"`{dst_col}`"
    try:
        if weight_col is None:
            e_cte = (
                f"e AS (SELECT {s} AS _src, {d} AS _dst FROM {ev} "
                f"WHERE {s} IS NOT NULL AND {d} IS NOT NULL)"
            )
            mass = "COUNT(*)"
        else:
            # cast first, then the NULL/non-positive weight filter —
            # the loop form's order exactly
            e_cte = (
                f"e AS (SELECT * FROM (SELECT {s} AS _src, {d} AS _dst, "
                f"CAST(`{weight_col}` AS BIGINT) AS _w FROM {ev} "
                f"WHERE {s} IS NOT NULL AND {d} IS NOT NULL) "
                f"WHERE _w IS NOT NULL AND _w > 0)"
            )
            mass = "SUM(_w)"
        ctes = [
            e_cte,
            "nodes AS (SELECT _src AS node FROM e UNION SELECT _dst AS node FROM e)",
            f"deg AS (SELECT _src, {mass} AS outdeg FROM e GROUP BY _src)",
        ]
        if seeds is None:
            ctes.append(
                "ndeg AS (SELECT node, CAST(COALESCE(outdeg, 0) AS BIGINT) "
                "AS outdeg, CAST({b} AS BIGINT) AS _base FROM nodes "
                "LEFT JOIN deg ON node = _src)".format(b=base)
            )
            ctes.append(
                f"r0 AS (SELECT node, outdeg, _base, "
                f"CAST({init_q} AS BIGINT) AS rank_q FROM ndeg)"
            )
        else:
            sv = f"__pipz_pr_s_{tag}"
            seeds.select(F.col("node")).distinct().createOrReplaceTempView(sv)
            views.append(sv)
            ctes.append(
                "ndeg AS (SELECT n.node, CAST(COALESCE(deg.outdeg, 0) AS "
                "BIGINT) AS outdeg, (sd.node IS NOT NULL) AS _is_seed, "
                "CAST(CASE WHEN sd.node IS NOT NULL THEN {b} ELSE 0 END "
                "AS BIGINT) AS _base FROM nodes n "
                "LEFT JOIN deg ON n.node = deg._src "
                f"LEFT JOIN {sv} sd ON n.node = sd.node)".format(b=base)
            )
            ctes.append(
                f"r0 AS (SELECT node, outdeg, _base, CAST(CASE WHEN "
                f"_is_seed THEN {init_q} ELSE 0 END AS BIGINT) AS rank_q "
                f"FROM ndeg)"
            )
        for it in range(iters):
            prev, cur = f"r{it}", f"r{it + 1}"
            if weight_col is None:
                ctes.append(
                    f"c{it} AS (SELECT _dst, rank_q DIV outdeg AS _c "
                    f"FROM e JOIN {prev} ON _src = node WHERE outdeg > 0)"
                )
            else:
                ctes.append(
                    f"c{it} AS (SELECT _dst, (rank_q DIV outdeg) * _w + "
                    f"((rank_q % outdeg) * _w) DIV outdeg AS _c "
                    f"FROM e JOIN {prev} ON _src = node WHERE outdeg > 0)"
                )
            ctes.append(
                f"s{it} AS (SELECT _dst, SUM(_c) AS _s FROM c{it} GROUP BY _dst)"
            )
            ctes.append(
                f"{cur} AS (SELECT node, outdeg, _base, _base + "
                f"((COALESCE(_s, 0L) DIV {den}L) * {num}L + "
                f"((COALESCE(_s, 0L) % {den}L) * {num}L) DIV {den}L) "
                f"AS rank_q FROM ndeg LEFT JOIN s{it} ON node = _dst)"
            )
        sql = (
            "WITH " + ",\n".join(ctes)
            + f"\nSELECT node, rank_q, outdeg FROM r{iters}"
        )
        return spark.sql(sql)
    finally:
        for v in views:
            spark.catalog.dropTempView(v)


def hits(
    edges: DataFrame,
    iters: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    norm_every: int | None = None,
    norm_target: int = 1_000_000,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999, "Authoritative
    sources in a hyperlinked environment") over a directed edge list
    — the fourth link-analysis member next to PageRank / TrustRank /
    weighted PageRank: a good AUTHORITY is pointed at by good hubs,
    a good HUB points at good authorities. The curation reading on a
    citation/hyperlink corpus graph: authorities are the reference
    pages worth up-weighting, hubs the index/directory pages worth
    recognizing as such. Returns (node, auth_q BIGINT, hub_q BIGINT).

    Integer-exact by the pagerank discipline — hubs start at 1, each
    iteration is the pure mutual recursion a ← Σ_in h, h ← Σ_out a
    over BIGINT with NO per-iteration float normalization (classic
    HITS L2-normalizes; scores here are compared WITHIN a run, so
    only the ratios matter and the oracle replays every sum
    exactly). Unnormalized scores grow like (d_in·d_out)^iters:
    the bound max_indeg^iters · max_outdeg^iters < 2^62 is ENFORCED
    when ``norm_every`` is None (one bounded max-degree action at
    build; a violation raises instead of letting a non-ANSI BIGINT
    sum wrap silently — r15 advice), or pass
    ``norm_every=N`` to rescale both score
    columns by k = max(score) DIV ``norm_target`` every N iterations
    (one MAX aggregate — a single number to the driver, the
    classifier's bounded-collect discipline; k is replayable, so the
    result stays engine-exact, and relative order within a column is
    preserved up to the documented DIV truncation).

    Scale shape: identical to the pagerank machine — two
    co-partitionable equi-joins + map-side-combined sums per
    iteration over skinny (node, BIGINT) rows; state never touches
    the driver except the optional norm scalar. Multi-edges
    contribute multiplicity; pass a distinct edge list for the
    simple graph."""
    if iters < 0:
        raise ValueError(f"need iters >= 0, got {iters}")
    if norm_every is not None and norm_every <= 0:
        raise ValueError(f"need norm_every > 0, got {norm_every}")
    if norm_target <= 0:
        raise ValueError(f"need norm_target > 0, got {norm_target}")
    from . import _caches

    # persist HERE, unlike pagerank's deliberate no-persist: that
    # machine's consumers all hash on the SAME node key, so
    # ReuseExchange dedups the edge scan; HITS alternates the join
    # key every half-iteration (src for the authority step, dst for
    # the hub step, node for the universe), no two exchanges match,
    # and an unpersisted edge plan re-runs its upstream join
    # 4×iters times (measured 13.0 s vs 4.4 s at sf0.1, iters=2)
    e = _caches.track(_directed_front(edges, src_col, dst_col).persist())
    nodes = _caches.track(_node_universe(e).persist())
    if iters == 0:
        # the zero-iteration basis (hubs 1, authorities 0) returned
        # directly — the loop below always rebinds both frames, so
        # this is the only path that needs the initial state
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("auth_q"),
            F.lit(1).cast("long").alias("hub_q"),
        )
    if norm_every is None:
        # runtime overflow guard (r15 advice): the docstring's
        # max_indeg^iters · max_outdeg^iters < 2^62 bound was the
        # caller's obligation only — enforce it, because non-ANSI
        # Spark would WRAP a BIGINT sum silently and corrupt every
        # downstream ratio. Two-tier check (r16 perf pass: the exact
        # per-direction max-degree aggregate is a union + two
        # groupBys — it measurably taxed every call on graphs that
        # could never overflow): first bound both max degrees by the
        # EDGE COUNT m (d_in, d_out ≤ m always), which is one cheap
        # count on the just-persisted edge frame (an action this
        # call needs anyway to materialize the 4·iters-times-reused
        # persist); only when 2·iters·log2(m) reaches the 2^62 line
        # does the exact max-degree aggregate run to decide for real.
        import math

        m_edges = e.count()
        if m_edges > 1 and 2 * iters * math.log2(m_edges) >= 62:
            dmax = {
                r["t"]: r["m"]
                for r in (
                    e.select(F.col("_src").alias("n"), F.lit("o").alias("t"))
                    .unionByName(
                        e.select(F.col("_dst").alias("n"), F.lit("i").alias("t"))
                    )
                    .groupBy("t", "n")
                    .agg(F.count(F.lit(1)).alias("c"))
                    .groupBy("t")
                    .agg(F.max("c").alias("m"))
                    .collect()
                )
            }
            din, dout = dmax.get("i", 0), dmax.get("o", 0)
            if din and dout and iters * (math.log2(din) + math.log2(dout)) >= 62:
                raise ValueError(
                    f"hits(iters={iters}) would overflow BIGINT on this graph "
                    f"(max indegree {din}, max outdegree {dout}: bound "
                    "max_indeg^iters * max_outdeg^iters >= 2^62) — pass "
                    "norm_every to rescale scores periodically"
                )
    # intermediate score frames stay SPARSE (only nodes with a
    # nonzero sum): an absent node contributes nothing to the next
    # sum, so zero-filling against the universe every half-iteration
    # would be pure shuffle waste — the universe joins back exactly
    # once, at the end
    hub = nodes.withColumn("hub_q", F.lit(1).cast("long"))
    for it in range(iters):
        if it == 0:
            # round-1 fusion (r16 perf pass): against the all-ones
            # hub basis, Σ hub over in-edges IS the in-degree — the
            # first half-iteration is a plain count over the edge
            # frame, no join (sum-of-ones ≡ COUNT, both BIGINT)
            auth = e.groupBy(F.col("_dst").alias("node")).agg(
                F.count(F.lit(1)).cast("long").alias("auth_q")
            )
        else:
            auth = (
                e.join(
                    hub.select(F.col("node").alias("_n"), "hub_q"),
                    F.col("_src") == F.col("_n"),
                )
                .groupBy(F.col("_dst").alias("node"))
                .agg(F.sum("hub_q").cast("long").alias("auth_q"))
            )
        hub = (
            e.join(
                auth.select(F.col("node").alias("_n"), "auth_q"),
                F.col("_dst") == F.col("_n"),
            )
            .groupBy(F.col("_src").alias("node"))
            .agg(F.sum("auth_q").cast("long").alias("hub_q"))
        )
        if norm_every is not None and (it + 1) % norm_every == 0:
            auth = auth.localCheckpoint()
            hub = hub.localCheckpoint()
            mx = (
                auth.agg(F.max("auth_q"))
                .crossJoin(hub.agg(F.max("hub_q")))
                .first()
            )
            k = max(mx[0] or 0, mx[1] or 0) // norm_target
            if k >= 2:
                auth = auth.select(
                    "node", F.expr(f"auth_q DIV {k}L").alias("auth_q")
                )
                hub = hub.select(
                    "node", F.expr(f"hub_q DIV {k}L").alias("hub_q")
                )
    return (
        nodes.join(auth.withColumnRenamed("auth_q", "_a"), "node", "left")
        .join(hub.withColumnRenamed("hub_q", "_h"), "node", "left")
        .select(
            "node",
            F.coalesce("_a", F.lit(0)).cast("long").alias("auth_q"),
            F.coalesce("_h", F.lit(0)).cast("long").alias("hub_q"),
        )
    )


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
    und, deg = _canonical_undirected(edges, src_col, dst_col)
    return _triangles_from(und, deg)


def _canonical_undirected(
    edges: DataFrame, src_col: str, dst_col: str
) -> tuple:
    """The simple-graph front shared by ``triangle_count`` and
    ``clustering_coefficient``: NULL/self-loop-free least/greatest
    canonical distinct edges (u < v) plus the per-node degree over
    them — ONE definition (over the family-wide
    :func:`_directed_front` NULL contract), so every simple-graph
    operator's semantics are mechanically identical."""
    e = _directed_front(edges, src_col, dst_col, out=("_u", "_v")).where(
        F.col("_u") != F.col("_v")
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
    return und, deg


def _triangles_from(und: DataFrame, deg: DataFrame) -> DataFrame:
    """Per-node triangle counts from a prepared canonical edge +
    degree pair (the body of ``triangle_count``)."""
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
        if it == 0:
            # round-1 fusion (r16 perf pass, the connected_components
            # label path's existing trick): joining sym against the
            # IDENTITY labeling (label == node) returns each edge's
            # own source, so the first neighbor frame is a pure
            # projection of sym — one full edge⨝label join dropped
            # from every call, identically at any scale
            nbr = sym.select(
                F.col("_d").alias("node"), F.col("_s").alias("label")
            )
        else:
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


def clustering_coefficient(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Local clustering coefficient per node (Watts & Strogatz 1998)
    over an undirected edge list — the template-clique detector: a
    near-dup pair graph's chance collisions have LCC ≈ 0 while
    template families sit near 1, and on a web corpus graph high-LCC
    neighborhoods are mutually-linked farms. Returns one row per
    node of the canonical simple graph: (node, triangles BIGINT,
    degree BIGINT, lcc DOUBLE) with

        lcc = 2·triangles / (degree · (degree − 1)),   degree ≥ 2
        lcc = 0.0 otherwise

    quantized by the family's floor rule. Composes the
    degree-oriented ``triangle_count`` machine (wedges ≤ m^{3/2}
    under any skew) with the SAME ``_canonical_undirected`` front —
    built once, consumed by both the triangle pass and the degree
    join, so the two operators' simple-graph semantics share one
    definition and the canonical edge plan appears once."""
    from .text import quantize4

    und, deg = _canonical_undirected(edges, src_col, dst_col)
    tri = _triangles_from(und, deg)
    t = F.coalesce(F.col("triangles"), F.lit(0)).cast("long")
    return deg.join(tri, deg["n"] == tri["node"], "left").select(
        F.col("n").alias("node"),
        t.alias("triangles"),
        F.col("d").cast("long").alias("degree"),
        F.when(
            F.col("d") >= 2,
            quantize4(
                (F.lit(2.0) * t) / (F.col("d") * (F.col("d") - F.lit(1)))
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )


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
    und, _ = _canonical_undirected(edges, src_col, dst_col)
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
            # EAGER on purpose (r17 re-measured): a lazy checkpoint
            # was a wash at sf0.1 (1.62 → 1.71 s solo, 2 fewer jobs)
            # and at scale the next round's SMJ probe-side map stages
            # can run CONCURRENTLY with the degree aggregation,
            # racing the unfilled cache into duplicate evaluations of
            # the peeled frame — the eager pin computes it exactly
            # once whatever the join strategy.
            cur = cur.localCheckpoint()
    return cur.groupBy("s").agg(F.count(F.lit(1)).alias("degree")).select(
        F.col("s").alias("node"), "degree"
    )


def _star_contraction(edges: DataFrame, max_rounds: int = 50) -> DataFrame:
    """(node, component) via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond") — O(log n) rounds on ANY graph shape, the escalation
    path for components whose min-label propagation distance exceeds
    the round budget (crawl-mirror CHAINS, where propagation is
    O(diameter)).

    ``edges`` must be the symmetrized (u, v) frame. Each round is two
    skinny shuffles over (long, long) rows:

    - large-star: every node u computes m = min(Γ(u) ∪ {u}) and
      re-points its strictly-LARGER neighbors at m — long tails fold
      onto local minima in parallel;
    - small-star: edges orient toward the smaller endpoint, every
      node re-points its smaller-or-equal neighbors (and itself) at
      m — stars of stars collapse one level.

    Fixpoint = the edge set is unchanged by a full round (checked
    exactly — tracked cardinality + an empty one-way miss count from
    a single left join on the distinct canonicalized frames, ONE
    action per round — not a hashable summary); at fixpoint the
    graph is a forest of stars
    whose centers are the component minima, so the oriented edge list
    IS the (node, component) map and centers map to themselves.
    ``max_rounds=50`` is unreachable in practice (covers ~2^50-node
    chains) and fails loudly rather than returning a non-fixpoint."""
    # LAZY checkpoint + count: the count action below materializes
    # the checkpointed RDD as a side effect (the same trick the round
    # loop uses), so canonicalization costs ONE job instead of the
    # eager checkpoint's dedicated job plus the count (r17).
    canon = (
        edges.where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    # track the frame's cardinality across rounds so the fixpoint
    # test needs ONE action per round (r15 verdict ask: the old
    # count-then-subtract pair was two jobs, and with the large-star
    # checkpoint also dropped the loop ran 4 jobs/round on pure
    # scheduling overhead — the bench's most expensive query)
    n_canon = canon.count()
    # Right-size the rounds' exchanges to the MEASURED edge count.
    # AQE coalesces post-shuffle partitions but not below
    # defaultParallelism (coalescePartitions.parallelismFirst), so a
    # 19k-row round still scheduled 32-64 tasks per exchange — and
    # with ~5 sequential exchanges per round × O(log n) rounds the
    # whole query was task-launch latency (measured at sf0.1: 8.8 s
    # at the session's 32 shuffle partitions, 6.7 s at 8). Scale
    # partitions to ~256k edge rows (~4 MB of (long,long)) each,
    # floor 8, NEVER above the session default — a 5B-edge graph
    # keeps its full parallelism, a near-converged tail stops paying
    # for idle tasks. Restored in the finally even on raise.
    spark = canon.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    saved_p = spark.conf.get(conf_key)
    try:
        # floor 1, not 8 (r16 perf pass): a 19k-row round is ONE
        # ~300 KB partition of (long, long) rows — the min-aggregates
        # and joins on it are sub-millisecond per row, so extra tasks
        # are pure launch latency (~5 sequential exchanges per round
        # × O(log n) rounds multiply every spare task). A graph big
        # enough to want parallel rounds sets it via -(-n // 262144)
        # exactly as before; only the tiny tail stops paying for it.
        scaled = min(int(saved_p), max(1, -(-n_canon // 262144)))
    except (TypeError, ValueError):
        scaled = None  # non-numeric conf (e.g. "auto"): leave it be
    # AQE inside the loop is now a MEASURED-SIZE decision, not a
    # constant. History: with groupBy+join rounds, AQE-off fell back
    # to sort-merge joins (6.2 s → 9.0 s, reverted). The r16 window
    # fusion removed every in-round join except the fixpoint check,
    # so AQE's only remaining contribution to a tiny round is its
    # per-exchange query-stage JOB — and the probe showed the loop
    # was exactly that (83 AQE jobs for 365 tasks). When the measured
    # edge count says rounds are single-partition (scaled == 1), the
    # static plan is strictly better: one action per round, no
    # per-exchange re-planning. Big graphs (scaled > 1) keep AQE for
    # its coalescing and skew handling at full parallelism — the
    # switch is anchored to n_canon, never to the local core count.
    aqe_key = "spark.sql.adaptive.enabled"
    saved_aqe = spark.conf.get(aqe_key)
    # .lower(): a session that set the flag as "True"/True would
    # silently keep AQE on for single-partition rounds (r16 ADVICE)
    drop_aqe = scaled == 1 and str(saved_aqe).lower() == "true"
    # The save/set/restore below mutates two SESSION-scoped confs, so
    # a concurrent query compiled on the same SparkSession during the
    # loop would plan under the loop's temporary values, and two
    # concurrent contractions could race the save/restore and leave
    # the wrong value behind (r16 verdict #3 / ADVICE). The lock
    # serializes contractions with each other; the engine's declared
    # batch queries run one at a time (the bench and the correctness
    # harness are both serial per session), and the streaming rigs
    # never run a contraction — documented assumption, now also
    # guarded against the self-race.
    with _STAR_CONF_LOCK:
        try:
            if scaled is not None:
                spark.conf.set(conf_key, str(scaled))
            if drop_aqe:
                spark.conf.set(aqe_key, "false")
            canon = _star_rounds(canon, n_canon, max_rounds)
        finally:
            spark.conf.set(conf_key, saved_p)
            spark.conf.set(aqe_key, saved_aqe)
    return _star_fixpoint_map(canon, edges)


def _star_rounds(canon: DataFrame, n_canon: int, max_rounds: int) -> DataFrame:
    """The alternating large-star / small-star loop body; returns the
    fixpoint edge frame. Split out so the partition-scaling wrapper
    above can restore the session conf around exactly the plans the
    loop creates (every plan here is both built AND executed inside
    the loop — the combined materialize+check is the per-pair
    action — so the scaled conf never leaks into the caller's lazy
    plans)."""
    from . import _caches

    # groupBy(u).min + join-back computes each row's partition min —
    # which is exactly a partition-only window MIN. The window form
    # emits identical rows from ONE hash(u) exchange (+ an in-stage
    # sort) where the join form paid the groupBy exchange PLUS an
    # AQE broadcast build/probe per round; with two such pairs per
    # round × O(log n) rounds the loop was scheduling, not data
    # (probe: 103 AQE jobs / 201 stages for 383 TASKS at sf0.1).
    #
    # The round is expressed as ONE static SQL string over a temp
    # view, not DataFrame calls: a probe split the ~440 ms/round wall
    # into ~207 ms of pure PYTHON-SIDE DataFrame construction (the
    # ~100 py4j round-trips the fluent API costs to build the round's
    # ~30 operators) vs ~59 ms for the identical plan via one
    # spark.sql() parse — per-round driver chatter, O(rounds) of it,
    # and nothing to do with the cluster. The SQL below is the EXACT
    # window form it replaces, verified round-by-round (identical
    # per-round |small| and miss counts on the sf0.1 chain) and
    # oracle-exact at both SFs.
    #
    # large-star: for each directed (u, v) with v > u, emit {v, m(u)},
    # m(u) = min(Γ(u) ∪ {u}) — the window min over u's rows. large is
    # deliberately NEITHER distinct NOR checkpointed: small-star is
    # duplicate-insensitive (idempotent MIN; small's own distinct
    # collapses any fan), and dropping large's dedup removed one full
    # shuffle per round (13.2 s → 9.1 s, earlier round). |large| =
    # |canon| exactly (sym contributes one v>u direction per edge).
    # small-star: orient big→small (sw reads large's (v, u) swapped —
    # computed in a nested select with non-shadowing names, r16
    # ADVICE: the self-shadowing u/v aliases relied on Spark
    # resolving the window args to the FROM-clause columns), re-point
    # every smaller neighbor (and the node itself) at the window
    # min m — all small < big post-orientation, so the bare MIN is m.
    #
    # NOTE (r17, measured and REJECTED): fusing TWO rounds into one
    # SQL per action (r2 = round(round(cn)), full-outer diff as the
    # fixpoint witness) halved the actions but DOUBLED the wall
    # (5.6 → 10.1 s solo): Spark inlines CTEs, so the un-materialized
    # r1 — referenced by sym2 twice, by both union branches above
    # sw2, and by the diff join — expanded to a 24-Window plan with
    # zero ReusedExchange. The per-round scheme keeps the duplicated
    # input a CHECKPOINTED RDD, whose re-scan is free; that is the
    # load-bearing property the pair fusion broke.
    round_sql_tpl = """
WITH sym AS (SELECT u, v FROM {cn} UNION ALL SELECT v AS u, u AS v FROM {cn}),
lw AS (SELECT u, v, LEAST(u, MIN(v) OVER (PARTITION BY u)) AS m FROM sym),
large AS (SELECT LEAST(v, m) AS u, GREATEST(v, m) AS v
          FROM lw WHERE v > u AND v <> m),
sw AS (SELECT small AS u, big AS v, m FROM (
  SELECT u AS big, v AS small, MIN(u) OVER (PARTITION BY v) AS m FROM large))
SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM (
  SELECT v AS a, m AS b FROM sw WHERE v <> m
  UNION ALL SELECT u AS a, m AS b FROM sw) t
WHERE a <> b
"""
    spark = canon.sparkSession
    tag = next(_STAR_VIEW_IDS)
    cn_view, sm_view = f"__pipz_star_cn_{tag}", f"__pipz_star_sm_{tag}"
    round_sql = round_sql_tpl.format(cn=cn_view)
    # the check joins the persisted round output back to its input:
    # both frames are distinct, so |small| == |canon| AND zero one-way
    # misses IS set equality; one action yields both numbers. The
    # build side's row count is known EXACTLY (n_canon = last round's
    # count) — broadcast below ~4M (long, long) rows (≈64 MB built),
    # plain shuffle join above (the correct 5B-edge shape).
    chk_sql_tpl = """
SELECT {hint} COUNT(*) AS _n,
       SUM(CASE WHEN c.u IS NULL THEN 1 ELSE 0 END) AS _miss
FROM {sm} s LEFT JOIN {cn} c ON s.u = c.u AND s.v = c.v
"""
    try:
        return _star_rounds_body(
            spark, canon, n_canon, max_rounds, cn_view, sm_view,
            round_sql, chk_sql_tpl, _caches,
        )
    finally:
        spark.catalog.dropTempView(cn_view)
        spark.catalog.dropTempView(sm_view)


_STAR_VIEW_IDS = itertools.count()


def _star_rounds_body(
    spark, canon, n_canon, max_rounds, cn_view, sm_view,
    round_sql, chk_sql_tpl, _caches,
):
    prev_cache: DataFrame | None = None
    for _ in range(max_rounds):
        canon.createOrReplaceTempView(cn_view)
        small = spark.sql(round_sql).persist()
        _caches.track(small)
        small.createOrReplaceTempView(sm_view)
        # the check action is the round's ONLY job (see the module
        # comments above): it fills small's cache and reads two
        # numbers. BROADCASTHASHJOIN hint below the 4M-row line only
        # (exact tracked count), plain join above.
        hint = "/*+ BROADCAST(c) */" if n_canon <= 4_000_000 else ""
        chk = spark.sql(
            chk_sql_tpl.format(hint=hint, sm=sm_view, cn=cn_view)
        ).first()
        n_small, miss = chk["_n"], chk["_miss"] or 0
        if n_small == n_canon and miss == 0:
            return small
        # Plan TRUNCATION is load-bearing, not just replay stability:
        # canon appears several times in the next round's expression
        # (the symmetrizing union + the check join), so without it
        # the logical tree grows ~4^rounds and the analyzer OOMs — a
        # bare persist() alone was measured to blow an 8 GB driver
        # heap by round ~10 on the sf0.1 chain (caching truncates
        # physical re-execution, never the logical plan). The LAZY
        # localCheckpoint keeps the truncation while shedding the
        # eager variant's dedicated job: the returned frame's logical
        # plan is already a bare RDD scan, and the marked RDD
        # materializes from the round's cache as a side effect of the
        # NEXT round's check job. The previous round's cache is
        # released exactly then (its checkpoint has materialized; the
        # one-round lag keeps peak cached state at two skinny rounds,
        # not O(log n) of them).
        canon, n_canon = small.localCheckpoint(eager=False), n_small
        if prev_cache is not None:
            prev_cache.unpersist()
        prev_cache = small
    raise RuntimeError(
        f"star contraction did not converge within {max_rounds} rounds — "
        "this exceeds the O(log n) bound for any real graph; the pair "
        "frame is likely nondeterministic across re-evaluations"
    )


def _star_fixpoint_map(canon: DataFrame, edges: DataFrame) -> DataFrame:
    """Read the (node, component) map off a star-forest fixpoint."""
    # fixpoint stars: canon is (small, big) = (center, leaf); every
    # leaf maps to its center and centers map to themselves
    leaves = canon.select(F.col("v").alias("node"), F.col("u").alias("component"))
    centers = canon.select(F.col("u").alias("node")).distinct()
    mapped = leaves.unionByName(
        centers.select("node", F.col("node").alias("component"))
    )
    # node-universe contract parity with the label path: a node whose
    # only pairs are self-loops has no canonical edge (u != v filtered
    # it) but the label path still emits it as its own singleton —
    # the star path must return the SAME (node, component) universe
    # or an auto-escalation would silently drop nodes from the map
    singletons = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .join(mapped, "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    return mapped.unionByName(singletons)


def _driver_union_find(spark, us, vs, id_type) -> DataFrame:
    """Exact min-label components for a driver-resident edge list
    (two parallel Arrow-decoded columns): path-halving union-find,
    then one pass electing each root's minimum member — the same
    (node, component = min reachable id) contract as the distributed
    paths, including self-loop singletons (a (7,7) edge registers
    node 7 with no union). The output schema carries the INPUT id
    type: the auto fast path must never make the result type a
    function of data volume (the driver hash gate is type-sensitive,
    DIVERGENCES.md #18)."""
    from pyspark.sql.types import StructField, StructType

    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(us, vs):
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp_min: dict = {}
    for node in parent:
        r = find(node)
        if r not in comp_min or node < comp_min[r]:
            comp_min[r] = node
    out = [(node, comp_min[find(node)]) for node in parent]
    schema = StructType(
        [StructField("node", id_type), StructField("component", id_type)]
    )
    return spark.createDataFrame(out, schema)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
    algorithm: str = "auto",
    driver_cap: int = 1_000_000,
) -> DataFrame:
    """(node, component) for the undirected pair graph; component =
    the minimum node id reachable from each node. Pairs with a NULL
    endpoint are dropped wholesale (malformed input carries no
    adjacency information), so nodes appearing ONLY in such pairs
    are absent from the map — identically under every ``algorithm``
    and the driver fast path.

    Iterative min-label propagation: each round every node takes the
    minimum label among itself and its neighbors — one shuffle
    (edge⨝label join + min-aggregate) per round over skinny
    (long, long) rows; converges in O(component diameter) rounds.
    Near-dup components are dense template clusters whose diameter is
    1-2 (LSH puts every member of a template in shared buckets), so
    round count stays in single digits at any corpus size — the
    100 TB consideration is per-round shuffle VOLUME (two longs per
    edge), not round count. Each round ``localCheckpoint``s the label
    frame: an iterative plan otherwise nests one join per round and
    re-executes the whole history every action. Convergence is
    detected by the label-sum invariant — labels only ever decrease,
    so an unchanged sum means a fixpoint (one cheap aggregate per
    round, no full-frame comparison join).

    ``algorithm`` picks the long-chain posture (crawl-mirror chains —
    the adversarial 100 TB case — have diameter ≫ ``max_iter``):

    - ``"auto"`` (default): propagate for ``max_iter`` rounds; if not
      converged, ESCALATE to alternating large-star/small-star
      contraction (O(log n) rounds on any shape) instead of raising.
    - ``"label"``: propagation only; non-convergence raises loudly
      (a silent non-fixpoint would split true clusters and leak
      duplicates through dedup_clusters).
    - ``"star"`` (synonym ``"contract"``): star contraction directly
      — the right call when the caller KNOWS the graph is
      chain-shaped (a crawl-mirror corpus, a linked-list-shaped id
      space), where propagation needs Θ(diameter) rounds but
      contraction closes in O(log n).

    Promoted to the graph family in r15 (previously internal to
    ``dedup.dedup_clusters``'s escalation path): connected
    components is a first-class corpus operator — dedup closures,
    domain-graph communities, link-graph reachability — not just
    the dedup family's private closure step.

    ``driver_cap``: pair graphs at or below this many edges skip the
    iterative machinery entirely — fetch the edge list via one
    bounded Arrow collect and run an exact union-find on the driver
    (labels IDENTICAL to the distributed paths by construction:
    component = min reachable id either way; output schema carries
    the input id type, so the result type never depends on data
    volume). The same bounded-collect reasoning as the other driver
    sites — at the 1M default the transient footprint is two Arrow
    int64 columns (~16 MB) plus the union-find dicts (boxed Python
    ints, worst case ~100-200 MB: bounded by the cap, never by data
    volume, and sized against the 8 GB driver, not hand-waved). The
    honest 100 TB posture: dedup pair graphs are SPARSE relative to
    the corpus (pairs ≈ duplicates, not documents²), so most real
    closures fit the cap; those that don't take the distributed path
    unchanged, reading the same persisted edge frame the probe
    materialized (the pair plan runs once either way).
    ``driver_cap=0`` disables (every round-trip test of the
    distributed machinery does this). Applies to ``"auto"`` only:
    explicit ``"label"``/``"star"`` are requests for a specific
    distributed algorithm.
    """
    from . import _caches

    if algorithm == "contract":
        algorithm = "star"
    if algorithm not in ("auto", "label", "star"):
        raise ValueError(
            "algorithm must be 'auto', 'label', 'star' or 'contract'"
        )
    # pin the DIRECTED edge list once: the probe below, the
    # symmetrized frame, and every propagation round all read it, so
    # an over-cap graph pays its (possibly expensive) pair plan
    # exactly once — CollectLimit feeding the probe materializes the
    # persisted rows the distributed path then reuses.
    # NULL-endpoint pairs are DROPPED by the family-wide
    # _directed_front (r15 review fix, now stated once there): before
    # the uniform WHERE the paths disagreed on them — label
    # propagation emitted a (NULL → min neighbor) row (NULL survives
    # groupBy as its own key) while star contraction emitted
    # (NULL → NULL) via the singleton re-add, so an auto escalation
    # silently changed the mapping. Nodes whose only pairs had a NULL
    # partner are absent from the map (no information, not a
    # singleton claim), and the driver fast path needs no NaN guard:
    # pandas can't widen the probe's int columns to float64.
    e = _caches.track(
        _directed_front(pairs, id_a, id_b, out=("u", "v")).persist()
    )
    if algorithm == "auto" and driver_cap > 0:
        # one bounded action sizes the graph AND fetches it when small
        # (cap+1 rows back = too big, fall through); Arrow-decoded
        # columns, not Row objects, so the transient driver footprint
        # at the 1M default cap is two int64 columns (~16 MB) plus
        # the union-find dicts (~100-200 MB of boxed ints at the
        # worst case) — bounded by the cap, never by data volume
        probe = e.limit(driver_cap + 1).toPandas()
        if len(probe) <= driver_cap:
            return _driver_union_find(
                pairs.sparkSession,
                probe["u"].tolist(),
                probe["v"].tolist(),
                e.schema["u"].dataType,
            )
    # symmetrize; every round reads this frame, so pin it (skinny rows)
    edges = _caches.track(
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).persist()
    )
    if algorithm == "star":
        return _star_contraction(edges)
    # init fuses the FIRST propagation round: with every label equal
    # to its node id, round 1's join+min is just min over neighbors —
    # one aggregate over the edge list, no join. Saves a full
    # join+checkpoint round on every call (dense near-dup components
    # then converge in the next round and confirm in the one after).
    labels = (
        edges.groupBy(F.col("u").alias("node"))
        .agg(F.min("v").alias("_mv"))
        .select("node", F.least(F.col("node"), F.col("_mv")).alias("label"))
    ).localCheckpoint()
    prev_sum = labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]
    converged = False
    for _ in range(max_iter):
        msgs = (
            edges.join(labels.withColumnRenamed("node", "u"), "u")
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("label").alias("_cand"))
        )
        labels = (
            labels.join(msgs, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("_cand", "label")).alias("label"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # a silent non-fixpoint would split true clusters into
        # several, and dedup_clusters would then keep multiple
        # "canonical" docs per duplicate group — the exact leakage
        # the operator exists to prevent. auto: the graph has a
        # propagation chain longer than max_iter (crawl-mirror
        # shape) — switch to the O(log n) star contraction, which is
        # immune to diameter. label: fail loudly (r6 behavior).
        if algorithm == "auto":
            return _star_contraction(edges)
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds; the pair graph contains a component with a longer "
            "propagation chain — raise max_iter or use algorithm='auto'/'star'"
        )
    return labels.select("node", F.col("label").alias("component"))


def label_propagation(
    edges: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Community detection by synchronous frequency-based label
    propagation (Raghavan et al. 2007, made deterministic): every
    node adopts the MOST FREQUENT label among its neighbors plus its
    own current label, ties broken by MIN label. Returns
    (node, label) after ``iters`` rounds; nodes sharing a label are
    one community.

    This is the graph family's third Pregel merge semiring and the
    one the family lacked: ``pagerank``/``hits`` aggregate by SUM
    (additive mass), ``propagate_min_labels``/``connected_components``
    by idempotent MIN (reachability), and LPA by **mode** —
    argmax-of-count — which is neither: dense intra-community edges
    outvote sparse cut edges, so labels stop at community boundaries
    instead of flooding the whole component the way min-label does.
    On the curation side that difference is the whole point: a
    near-dup pair graph's connected component says "transitively
    similar", while its LPA communities split a chained mirror farm
    into the template families that actually share content.

    Determinism (the repo's engine-exact discipline — published LPA
    is randomized in both tie-break and visit order): updates are
    synchronous (every round reads only the previous round's labels,
    so there is no visit order to pick), the vote includes the
    node's own label exactly once (the standard self-vote damping —
    without it a bipartite graph two-colors itself and oscillates
    forever under synchronous updates), and the winner is the
    lexicographically (count DESC, label ASC) first candidate. Any
    engine replays a round as: neighbor-label counts UNION the self
    vote → GROUP BY node → argmax.

    Physical shape per round: edge ⨝ label equi-join on the
    symmetrized frame, then ONE aggregation tree — counts collapse
    map-side to (node, label, cnt) and the argmax is a struct-MIN of
    (-cnt, label), itself partial-aggregatable, so the exchange
    carries at most one candidate per (partition, node, label) and
    the argmax adds no second shuffle wave beyond the count's. No
    window (a per-node rank would sort the whole frame); no driver
    state at any scale. Lineage doubles per round (the label frame
    feeds both the neighbor join and the self-vote union) — pass
    ``checkpoint_every`` past ~4 rounds, the ``bfs_hops`` rule.

    Reference parity: no graph surface in the reference
    (api.go:423-428 is value-at-a-time) — LLM-data-pipeline operator
    per the brief, same rationale as ``pagerank``.
    """
    if iters < 0:
        raise ValueError(f"need iters >= 0, got {iters}")
    if checkpoint_every is not None and checkpoint_every <= 0:
        raise ValueError(f"need checkpoint_every > 0, got {checkpoint_every}")
    e = _directed_front(edges, src_col, dst_col, out=("_s", "_d"))
    sym = e.union(e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d")))
    labels = _node_universe(e, "_s", "_d").withColumn(
        "label", F.col("node")
    )

    for it in range(iters):
        if it == 0:
            # round-1 fusion: against the identity labeling the
            # neighbor-vote frame is sym itself projected (edge
            # multiplicity preserved — the join carried it through
            # unchanged, one label row per node) — one full
            # edge⨝label join dropped per call (r16 perf pass)
            nbr = sym.select(
                F.col("_d").alias("node"), F.col("_s").alias("label")
            )
        else:
            nbr = sym.join(
                labels.select(F.col("node").alias("_n"), F.col("label").alias("_l")),
                F.col("_s") == F.col("_n"),
            ).select(F.col("_d").alias("node"), F.col("_l").alias("label"))
        votes = nbr.union(labels.select("node", "label"))
        cnt = votes.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("_cnt")
        )
        # argmax by (count DESC, label ASC) as a partial-aggregatable
        # struct MIN — never a per-node window sort
        labels = cnt.groupBy("node").agg(
            F.min(
                F.struct((-F.col("_cnt")).alias("_nc"), F.col("label").alias("_lb"))
            )["_lb"].alias("label")
        )
        if (
            checkpoint_every is not None
            and (it + 1) % checkpoint_every == 0
            and it + 1 < iters
        ):
            labels = labels.localCheckpoint()

    return labels


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    symmetric: bool = False,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Multi-source BFS hop distance — the min-PLUS member of the
    Pregel taxonomy (SUM: pagerank/hits; idempotent MIN over ids:
    connected_components; mode: label_propagation; THIS: min over
    ``dist + 1``, the tropical semiring, i.e. unweighted shortest
    paths). Returns (node, hops BIGINT): the minimum number of
    directed edges from ANY seed, for every node reachable within
    ``iters`` hops — seeds themselves at 0; unreached nodes are
    ABSENT (the caller left-joins its universe if it wants NULLs,
    the same reached-only convention as the frontier literature).

    Curation reading: hop distance from a trusted seed set is the
    link-graph locality signal TrustRank smooths — BFS gives the
    crisp integer version ("within 2 clicks of a curated hub"), and
    on near-dup pair graphs it measures chain depth from canonical
    documents (mirror-of-a-mirror distance).

    Per round: dist ⨝ edges on src (equi-join, co-partitionable on
    the node key), candidates ``dist + 1`` union the standing map,
    then GROUP BY node MIN — idempotent, so map-side combine
    collapses each partition to one candidate per node and re-sent
    already-settled distances are absorbed exactly. Hop counts are
    BIGINT; the replay is bit-free integer arithmetic any engine
    reproduces. Seeds not present in the edge frame still appear in
    the output at hops 0 (a seed is a claim about the node, not
    about its adjacency); NULL seed ids are dropped like NULL edge
    endpoints. ``symmetric=True`` unions the reversed edges first
    (undirected reachability).

    LINEAGE DOUBLES PER ROUND, not linearly: each round's frame
    references the previous one TWICE (the standing map in the
    union AND the join side), so the lazy plan holds 2^iters copies
    of the seed lineage — past ~4 rounds, or with a non-trivial
    seed plan, pass ``checkpoint_every`` (and pre-checkpoint
    expensive seeds) or the DAG scheduler itself becomes the
    bottleneck (an iters=6 run over a joined seed frame OOMed the
    driver before any executor worked).

    Reference parity: none (no graph surface in the reference) —
    LLM-data-pipeline operator per the brief.
    """
    if iters < 0:
        raise ValueError(f"need iters >= 0, got {iters}")
    if checkpoint_every is not None and checkpoint_every <= 0:
        raise ValueError(f"need checkpoint_every > 0, got {checkpoint_every}")
    e = _directed_front(edges, src_col, dst_col, out=("_s", "_d"))
    if symmetric:
        e = e.union(e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d")))
    dist = (
        seeds.select(F.col(seed_col).alias("node"))
        .where(F.col(seed_col).isNotNull())
        .distinct()
        .withColumn("hops", F.lit(0).cast("long"))
    )

    for it in range(iters):
        cand = e.join(
            dist.select(F.col("node").alias("_s"), "hops"), "_s"
        ).select(
            F.col("_d").alias("node"), (F.col("hops") + F.lit(1)).alias("hops")
        )
        dist = (
            dist.union(cand)
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
        )
        if (
            checkpoint_every is not None
            and (it + 1) % checkpoint_every == 0
            and it + 1 < iters
        ):
            dist = dist.localCheckpoint()

    return dist


def common_neighbor_pairs(
    edges: DataFrame,
    min_common: int = 2,
    max_degree: int | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Link prediction by common-neighbor count (Liben-Nowell &
    Kleinberg 2003's strongest simple predictor, integer-exact
    variant): for every NON-adjacent pair of the canonical simple
    graph sharing at least ``min_common`` neighbors, one row
    (id_a, id_b, common BIGINT, pref_attach BIGINT) with id_a < id_b,
    ``common`` the shared-neighbor count and ``pref_attach`` the
    degree product (the preferential-attachment score — both classic
    predictors, both exact integers; Adamic-Adar's 1/log(deg) is
    deliberately NOT offered: a transcendental per neighbor would
    break the repo's engine-exact replay discipline for a
    rank-equivalent-in-practice signal).

    Curation reading: the near-dup pair graph is INCOMPLETE by
    construction (banding misses pairs at the threshold boundary;
    df-caps drop boilerplate-driven candidates) — two documents
    sharing many near-dup partners are themselves probable
    near-dups, so these scores are the candidate list for a
    second-pass exact verify (pair-graph densification), and on a
    citation/link corpus they are the standard related-item signal.

    Scale posture: a wedge center w contributes C(deg(w), 2)
    candidate pairs — hubs make that quadratic, exactly the
    boilerplate-gram blowup the dedup family df-caps, and the SAME
    answer applies: ``max_degree`` drops over-cap wedge CENTERS
    before pairing (a hub's common-neighbor evidence is weak anyway
    — sharing a mega-hub says little), making candidate volume
    ≤ Σ_w min(deg(w), cap)² a priori. The pair count then
    partial-aggregates map-side (the exchange carries combined
    (a, b, partial) rows, not raw wedges), existing edges drop via
    one anti-join on the canonical edge frame, and degrees join
    back broadcast-small. Declared-query plan is canaried
    cartesian-free with map-side combine.

    Reference parity: none (no graph surface in the reference) —
    LLM-data-pipeline operator per the brief.
    """
    if min_common < 1:
        raise ValueError(f"need min_common >= 1, got {min_common}")
    if max_degree is not None and max_degree < 1:
        raise ValueError(f"need max_degree >= 1, got {max_degree}")
    und, deg = _canonical_undirected(edges, src_col, dst_col)
    adj = und.select(F.col("u").alias("_w"), F.col("v").alias("_x")).union(
        und.select(F.col("v").alias("_w"), F.col("u").alias("_x"))
    )
    if max_degree is not None:
        ok = deg.where(F.col("d") <= max_degree).select(
            F.col("n").alias("_w")
        )
        adj = adj.join(ok, "_w")
    cand = (
        adj.alias("l")
        .join(
            adj.alias("r"),
            (F.col("l._w") == F.col("r._w")) & (F.col("l._x") < F.col("r._x")),
        )
        .select(F.col("l._x").alias("id_a"), F.col("r._x").alias("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
        .where(F.col("common") >= min_common)
    )
    nonedge = cand.join(
        und,
        (cand["id_a"] == und["u"]) & (cand["id_b"] == und["v"]),
        "left_anti",
    )
    da = deg.select(F.col("n").alias("id_a"), F.col("d").alias("_da"))
    db = deg.select(F.col("n").alias("id_b"), F.col("d").alias("_db"))
    return (
        nonedge.join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a",
            "id_b",
            "common",
            (F.col("_da") * F.col("_db")).cast("long").alias("pref_attach"),
        )
    )


def sssp_cost(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    seed_col: str = "node",
    symmetric: bool = False,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Multi-source weighted shortest paths, bounded Bellman-Ford —
    the WEIGHTED min-plus machine next to ``bfs_hops``'s unit-weight
    one: after ``iters`` rounds, (node, cost BIGINT) is the exact
    minimum total edge weight over all paths of at most ``iters``
    edges from any seed (Bellman-Ford's standard k-round invariant;
    with ``iters`` ≥ longest shortest path's hop count the costs are
    the true distances). Unreached nodes absent, seeds at 0 —
    ``bfs_hops``'s reached-only conventions exactly.

    Weights cast to BIGINT; edges whose weight is NULL or ≤ 0 are
    DROPPED, stated up front (the ``pagerank weight_col`` rule):
    zero/negative weights would let longer paths undercut shorter
    ones within the round budget and turn "cost so far" into an
    unordered search — positive integer weights keep every round's
    map a monotone refinement, which is also what makes the
    idempotent MIN fold absorb re-sent settled costs exactly.
    Fractional weights belong upstream: quantize to integers first
    (the repo-wide fixed-point discipline — BIGINT sums are exact
    under any aggregation order, doubles are not).

    Curation reading: with weight = −log-ish quantized link quality,
    min total cost from trusted seeds is the crisp path-quality
    signal (the cheapest editorial chain from a curated hub); with
    weight = 1 it degenerates to ``bfs_hops`` exactly.

    Physical shape: identical to ``bfs_hops`` — per round one
    dist ⨝ edges equi-join on the node key, candidates
    ``cost + w``, union the standing map, GROUP BY node MIN with
    map-side combine. The weight rides the ONE edge projection
    (``_directed_front``'s ``extra``), so the scan is read once per
    round and never re-keyed. Lineage doubles per round exactly as
    in ``bfs_hops`` — same ``checkpoint_every`` rule.

    Reference parity: none (no graph surface in the reference) —
    LLM-data-pipeline operator per the brief.
    """
    if iters < 0:
        raise ValueError(f"need iters >= 0, got {iters}")
    if checkpoint_every is not None and checkpoint_every <= 0:
        raise ValueError(f"need checkpoint_every > 0, got {checkpoint_every}")
    e = _directed_front(
        edges,
        src_col,
        dst_col,
        out=("_s", "_d"),
        extra=(F.col(weight_col).cast("long").alias("_w"),),
    ).where(F.col("_w").isNotNull() & (F.col("_w") > 0))
    if symmetric:
        e = e.union(
            e.select(
                F.col("_d").alias("_s"), F.col("_s").alias("_d"), "_w"
            )
        )
    dist = (
        seeds.select(F.col(seed_col).alias("node"))
        .where(F.col(seed_col).isNotNull())
        .distinct()
        .withColumn("cost", F.lit(0).cast("long"))
    )

    for it in range(iters):
        cand = e.join(
            dist.select(F.col("node").alias("_s"), "cost"), "_s"
        ).select(
            F.col("_d").alias("node"),
            (F.col("cost") + F.col("_w")).alias("cost"),
        )
        dist = (
            dist.union(cand)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
        )
        if (
            checkpoint_every is not None
            and (it + 1) % checkpoint_every == 0
            and it + 1 < iters
        ):
            dist = dist.localCheckpoint()

    return dist


__all__ = [
    "bfs_hops",
    "clustering_coefficient",
    "common_neighbor_pairs",
    "connected_components",
    "hits",
    "kcore_peel",
    "label_propagation",
    "pagerank",
    "propagate_min_labels",
    "sssp_cost",
    "triangle_count",
]
