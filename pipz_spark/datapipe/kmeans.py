"""Distributed Lloyd k-means over an embedding column — the iterative
broadcast-centroid machine (Lloyd 1982; the standard Spark design:
centroids live on the driver, every iteration is ONE corpus pass).

A 100 TB corpus cannot iterate by shuffling itself: the only state
k-means actually carries between iterations is k × dims numbers.  So
each iteration

  1. assigns every vector to its nearest centroid with a PURE
     whole-stage-codegen expression (the centroids are array
     literals — no join, no broadcast variable, no Python),
  2. map-side partial-aggregates per-(cell, dimension) coordinate
     sums + counts down to ≤ k × dims skinny rows (the dimensions
     ride an explode so the PLAN stays constant-size at any
     embedding width — a dims-wide aggregate would grow Catalyst's
     analysis cost with the vector dimension), and
  3. collects those k × dims rows to the driver to form the next
     centroids (a bounded driver materialization inventoried in
     README's collect audit).

Corpus passes: ``iters`` assignment+update passes plus one final
assignment pass; nothing corpus-sized ever shuffles or persists.

Every arithmetic step is engine-portable by construction so a SQL
oracle can replay the exact clustering (the repo's float-determinism
discipline, cf. ``sampling.dsir_log_ratio``):

  - coordinates are floor-quantized to integers (``coord_quant``)
    before summation — the per-cell sums are exact integers under
    any partial-aggregation order;
  - a centroid coordinate is sum / (n · coord_quant) evaluated in
    double — both operands exact integers < 2^53, so every engine
    rounds to the identical double;
  - a distance is the exact integer Σ_d floor((x_d − c_d)² ·
    dist_quant + 0.5) — argmin over (distance, cell) has no float
    comparison at all, and ties break on the lower cell index;
  - seed centroids are the k vectors with the lexicographically
    smallest md5(id || salt), the hash-order trick every
    deterministic sampler in this repo uses.

A cell that loses all members keeps its previous centroid (the
standard Lloyd convention that keeps k stable).

Reference parity: the reference engine has no clustering operator —
this belongs to the repo's LLM-data-pipeline surface (embedding
curation: IVF coarse quantizers, SemDeDup-style cluster-then-dedup
per Abbas et al. 2023 §3, which runs k-means before per-cluster
pairwise pruning).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _quantize_coord(x: float, coord_quant: int) -> float:
    # identical to the engine-side floor(x * q + 0.5) / q (Python
    # floats are the same IEEE binary64 the JVM and DuckDB use)
    return math.floor(x * coord_quant + 0.5) / coord_quant


def _sqdist_q(vec, center: list[float], dist_quant: int):
    """Exact-integer quantized squared L2 distance to a literal
    center — the family's ONE distance definition (shared by
    ``kmeans_embeddings``'s assignment and ``kcenter_select``'s
    greedy): per-dim floor((x−c)²·Q + 0.5) is one double
    subtract/multiply pair (exactly rounded, identical in any
    engine) snapped to BIGINT, and the dim-sum is integer, so no
    comparison downstream ever touches a float."""
    lit_c = F.array(*[F.lit(float(v)) for v in center])
    per_dim = F.zip_with(
        vec,
        lit_c,
        lambda x, cc: F.floor(
            (x - cc) * (x - cc) * F.lit(float(dist_quant)) + F.lit(0.5)
        ),
    )
    return F.aggregate(per_dim, F.lit(0).cast("long"), lambda acc, t: acc + t)


def _assignment(vec, centroids: list[list[float]], dist_quant: int):
    """(cell, dist_q) columns: argmin over integer-quantized squared
    L2 distances to literal centroids — pure codegen, no join."""
    structs = []
    for j, c in enumerate(centroids):
        d = _sqdist_q(vec, c, dist_quant)
        structs.append(F.struct(d.alias("d"), F.lit(j).alias("cell")))
    best = F.least(*structs)
    return best["cell"].alias("cell"), best["d"].alias("dist_q")


def kmeans_embeddings(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "kmeans",
    coord_quant: int = 10_000_000,
    dist_quant: int = 1_000_000_000,
) -> DataFrame:
    """Cluster ``df[vec_col]`` into ``k`` cells with ``iters`` Lloyd
    iterations; returns (id_col, cell INT, dist_q BIGINT) — the final
    assignment under the post-iteration centroids, with the exact
    integer-quantized squared distance (divide by ``dist_quant`` for
    the float value). Deterministic end to end; see module docstring
    for the engine-portability construction. Rows whose vector is
    NULL are excluded (they have no geometry to cluster).

    PLAN-SIZE BOUNDARY: the assignment expression embeds the k
    centroids as k × dims array literals, so the Catalyst expression
    tree grows as O(k · dims). That is the right trade for the
    regime this operator targets — IVF coarse quantizers and SemDeDup
    cells, k up to a few hundred — where the plan stays tens of KB
    and assignment compiles to join-free whole-stage codegen. Asking
    k = 10⁴ over 1024-dim vectors would build a multi-megabyte
    expression tree and stall the planner long before the executors;
    for large k, use ``dp_ann_ivf``'s sampled-quantizer path (train
    on a TakeOrdered sample, assign via the bucketed join) instead.
    A guard warns past k · dims > 262,144 (~2 MB of literals)."""
    if k < 2:
        raise ValueError(f"need k >= 2, got {k}")
    if iters < 0:
        raise ValueError(f"need iters >= 0, got {iters}")
    vec = F.col(vec_col).cast("array<double>")
    base = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col), vec.alias("_v")
    )
    v = F.col("_v")

    seed_rows = (
        base.select(
            id_col,
            "_v",
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))).alias("_h"),
        )
        .orderBy("_h", id_col)  # TakeOrdered: k rows, never a full sort
        .limit(k)
        .collect()
    )
    if len(seed_rows) < k:
        raise ValueError(f"need >= {k} non-null vectors, got {len(seed_rows)}")
    dims = len(seed_rows[0]["_v"])
    if k * dims > 262_144:
        import warnings

        warnings.warn(
            f"kmeans_embeddings: k*dims = {k}*{dims} = {k * dims} literal "
            "centroid coordinates will build a multi-MB Catalyst expression "
            "tree; this operator targets coarse-quantizer k (a few hundred) "
            "— use dp_ann_ivf's sampled-quantizer path for large k",
            stacklevel=2,
        )
    centroids = [
        [_quantize_coord(x, coord_quant) for x in r["_v"]] for r in seed_rows
    ]

    for _ in range(iters):
        cell, _ = _assignment(v, centroids, dist_quant)
        # dims-EXPLODED update, not a dims-wide aggregate: a column
        # per dimension would make the plan (and Catalyst's analysis
        # cost) grow with the embedding width — a 1024-dim corpus
        # would plan a 1025-column aggregate. Exploding keeps the
        # plan constant-size at any dims; the generate fuses into the
        # same whole-stage-codegen pipeline, the partial aggregate
        # still combines map-side (k × dims cells), and the shuffle
        # is the identical k × dims skinny longs either way.
        # two selects: the struct-field extraction inside `cell` must
        # resolve in a generator-free projection (posexplode in the
        # same select trips the analyzer's struct-field naming);
        # Catalyst collapses them into one stage regardless
        sums = (
            base.select(cell, "_v")
            .select(
                "cell",
                F.posexplode(
                    F.transform(
                        v,
                        lambda x: F.floor(
                            x * F.lit(float(coord_quant)) + F.lit(0.5)
                        ),
                    )
                ).alias("_d", "_q"),
            )
            .groupBy("cell", "_d")
            .agg(F.sum("_q").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .collect()  # bounded: k × dims skinny rows
        )
        new_centroids = [c[:] for c in centroids]  # empty cell keeps its own
        for r in sums:
            new_centroids[r["cell"]][r["_d"]] = r["_s"] / (
                r["_n"] * coord_quant
            )
        centroids = new_centroids

    cell, dist_q = _assignment(v, centroids, dist_quant)
    return base.select(id_col, cell, dist_q)


def kcenter_select(
    df: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "kcenter",
    dist_quant: int = 1_000_000_000,
) -> DataFrame:
    """Greedy k-center / farthest-point diversity selection (Gonzalez
    1985; the classic 2-approximation to the k-center objective) over
    an embedding column — the coreset/diverse-subset primitive the
    sampling family lacked: where ``deterministic_sample`` draws
    uniformly and ``priority_sample`` draws by weight, k-center picks
    the k mutually FARTHEST exemplars, the standard seed step for
    diverse eval-set construction and coverage-based corpus probes
    (and the farthest-first init k-means literature recommends).

    Greedy rule: seed with the hash-minimal row (the repo's
    deterministic-sampler trick, as in ``kmeans_embeddings``), then
    k−1 times pick the point with the LARGEST distance to its
    nearest already-selected center (ties: smaller id). Returns the
    full assignment — (id_col, center_id, d2_q BIGINT): every
    point's nearest selected center by (distance, center id) and the
    exact integer-quantized squared L2 distance (divide by
    ``dist_quant`` for the float value; centers assign to themselves
    at 0). ``max(d2_q)`` is the k-center covering radius.

    Engine-exact: distances are the exact integers of
    ``kmeans_embeddings``'s construction (no float comparison
    anywhere — see ``_sqdist_q``), so any engine replays selection
    and assignment bit-for-bit with k−1 unrolled argmax rounds.

    100 TB posture: the only state is the k selected vectors — k
    bounded driver rows (the kmeans collect discipline), embedded
    back as array literals so every pass is join-free whole-stage
    codegen. Round j evaluates j literal distances per row: total
    work O(k²·dims) per point for selection + O(k·dims) for the
    final assignment, each round ONE corpus pass ending in a
    TakeOrdered(1) — never a full sort, never a shuffle of the
    corpus, no lineage growth (each pass re-derives from the scan,
    there is no iterated frame to checkpoint). The same
    O(k·dims)-literal plan-size boundary as kmeans applies; this
    operator targets small k (diverse exemplars), not large-k
    clustering.

    Reference parity: no sampling/geometry surface in the reference —
    LLM-data-pipeline operator per the brief (SURVEY §2.5).
    """
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    vec = F.col(vec_col).cast("array<double>")
    base = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col), vec.alias("_v")
    )
    v = F.col("_v")

    seed = (
        base.select(
            id_col,
            "_v",
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))).alias("_h"),
        )
        .orderBy("_h", id_col)
        .limit(1)
        .collect()
    )
    if not seed:
        raise ValueError("need >= 1 non-null vector, got 0")
    centers = [(seed[0][id_col], list(seed[0]["_v"]))]

    for _ in range(k - 1):
        mind = F.least(
            *[_sqdist_q(v, cv, dist_quant) for _, cv in centers]
        ) if len(centers) > 1 else _sqdist_q(v, centers[0][1], dist_quant)
        far = (
            base.select(id_col, "_v", mind.alias("_mind"))
            .orderBy(F.col("_mind").desc(), F.col(id_col))
            .limit(1)
            .collect()
        )
        if not far:
            break
        centers.append((far[0][id_col], list(far[0]["_v"])))

    # the center id rides back as a literal — pin it to the input id
    # column's type so the output schema never depends on how Python
    # boxed the collected value
    id_type = base.schema[id_col].dataType
    structs = [
        F.struct(
            _sqdist_q(v, cv, dist_quant).alias("d"),
            F.lit(cid).cast(id_type).alias("cid"),
        )
        for cid, cv in centers
    ]
    best = F.least(*structs) if len(structs) > 1 else structs[0]
    return base.select(
        F.col(id_col),
        best["cid"].alias("center_id"),
        best["d"].alias("d2_q"),
    )


__all__ = ["kcenter_select", "kmeans_embeddings"]
