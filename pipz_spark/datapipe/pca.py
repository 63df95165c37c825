"""Distributed top-principal-component projection — power iteration
over the EXACT integer scatter matrix (von Mises & Pollaczek-Geiringer
1929; the embedding-postprocessing use is Mu & Viswanath 2018's
"All-but-the-Top": remove or inspect the dominant component before
similarity work, and SemDeDup-style pipelines whiten embeddings the
same way).

The machine completes the iterative taxonomy's third corner: kmeans
carries k × dims state, the classifier n_buckets, PageRank per-node
DataFrame state — PCA's state is the d × d scatter matrix, gathered
by ONE corpus pass (per-task integer numpy Gram accumulation over
Arrow batches: each task emits d² skinny rows however many vectors
it saw, so the shuffle is tasks × d² rows no matter the corpus
size), after which the power iteration is driver-side linear algebra
over d² numbers (a bounded materialization, the kmeans-centroid
stance — README's collect audit lists it). The fold assumes
roughly unit-norm embeddings (the standard case): the per-task
guard raises — rather than letting numpy wrap silently — if
rows · max|xq|² would exceed int64.

Engine-exact with ZERO transcendentals — stronger than the kmeans
discipline (no quantized exp/ln anywhere, so there is no
DIVERGENCES-#25 residual at all):

  - coordinates floor-quantize at ``coord_quant`` into BIGINT; the
    scatter entries A_ij = Σ xq_i·xq_j are exact integer sums under
    any aggregation order;
  - the iteration vector lives as integers k_j scaled 1e6; a matvec
    w = A·k is exact integer arithmetic (Python's arbitrary
    precision on the driver; an SQL replay needs 128-bit — DuckDB
    HUGEINT);
  - normalization is MAX-ABS, not L2: k' = (w · 1e6) div max|w_i| —
    integer division TRUNCATED TOWARD ZERO (the semantics of both
    Spark's ``DIV`` and DuckDB's integer ``//``; Python's ``//``
    FLOORS, so the driver divides |w| and reapplies the sign — a
    floored replay diverges on any negative component, caught by the
    sf0.001 tail gate), no sqrt, still a valid power-iteration
    normalizer (any norm works; max-abs keeps everything integral);
  - the per-vector projection is the exact integer Σ_d xq_d·k_d,
    returned both raw (``pc1_q``) and as the one correctly-rounded
    division pc1_q / (coord_quant · 1e6).

``iters`` power steps from the all-ones start vector DEFINE the
output (the kmeans iters=2 stance): a caller wanting convergence
raises ``iters`` — each step costs driver-side d² integer multiplies
only, the corpus is never touched again after the scatter pass.
A start vector exactly orthogonal to the top eigenvector would stall
power iteration in exact arithmetic; with data-derived matrices and
the all-ones start this is measure-zero, and the failure mode is a
well-defined projection onto the reached vector, not an error.

Reference parity: the reference engine has no linear-algebra
operator — LLM-data-pipeline surface (SURVEY §2 datapipe family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_project(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
    coord_quant: int = 10_000,
) -> DataFrame:
    """Project every vector onto the direction reached by ``iters``
    power-iteration steps on the corpus scatter matrix. Returns
    (id_col, pc1_q BIGINT, pc1 DOUBLE) — ``pc1_q`` is the exact
    integer projection Σ xq_d·k_d, ``pc1`` = pc1_q / (coord_quant ·
    1e6). Rows with NULL vectors are excluded; every non-NULL vector
    must share the first row's dimensionality (raises otherwise —
    a silent dimension mix would corrupt the scatter matrix).
    Deterministic end to end; see the module docstring."""
    if iters < 0:
        raise ValueError(f"need iters >= 0, got {iters}")
    if coord_quant <= 0:
        raise ValueError(f"need coord_quant > 0, got {coord_quant}")
    q = float(coord_quant)
    xq = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * F.lit(q) + F.lit(0.5)).cast("long"),
    )
    base = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col), xq.alias("_xq")
    )
    dims_rows = base.select(F.size("_xq").alias("_d")).distinct().collect()
    if not dims_rows:
        raise ValueError("pca_project: no non-null vectors")
    if len(dims_rows) > 1:
        raise ValueError(
            f"pca_project: mixed dimensionalities {sorted(r['_d'] for r in dims_rows)}"
        )
    d = dims_rows[0]["_d"]

    # ONE corpus pass: per-task integer Gram accumulation. A naive
    # dims-pair explode would generate d² rows PER VECTOR (4096 at
    # d = 64) before the map-side combine — JVM row churn that grows
    # with n·d², the wrong shape at 100 TB. Instead each Arrow task
    # folds its batches into ONE d × d numpy int64 Gram matrix
    # (Xqᵀ·Xq — exact integer matmul; entries bounded by
    # rows_per_task · (coord_quant·|x|)², ~10⁶× headroom inside
    # int64 at any sane task size) and emits d² skinny rows per
    # TASK; the final aggregate sums tasks × d² rows. The values are
    # identical to the explode formulation — an SQL oracle replays
    # them with the d²-per-vector self-join, shape-free.
    import pandas as pd
    import numpy as np

    def gram(batches):
        # numpy int64 matmul wraps SILENTLY on overflow (r13 ADVICE);
        # guard with the exact worst case — a Gram entry is a sum of
        # `rows` terms each ≤ max|xq|², so rows · max_xq² must stay
        # under 2^62 (factor-2 headroom). Unit-norm embeddings at the
        # default coord_quant=10⁴ allow ~4.6e10 rows per task; the
        # guard only trips on unnormalized data, where the fix is a
        # smaller coord_quant or more input partitions.
        acc = np.zeros((d, d), dtype=np.int64)
        rows = 0
        max_xq = 0
        for pdf in batches:
            m = np.asarray(
                [np.asarray(v, dtype=np.int64) for v in pdf["_xq"]], dtype=np.int64
            )
            if len(m):
                rows += len(m)
                max_xq = max(max_xq, int(np.abs(m).max()))
                if max_xq and rows > (2**62) // (max_xq * max_xq):
                    raise OverflowError(
                        f"pca_project: task Gram fold would exceed int64 "
                        f"({rows} rows with max |xq| = {max_xq}); normalize "
                        f"the embeddings, lower coord_quant, or repartition "
                        f"the input into smaller tasks"
                    )
                acc += m.T @ m
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        yield pd.DataFrame(
            {"_i": ii.ravel(), "_j": jj.ravel(), "_g": acc.ravel()}
        )

    pairs = (
        base.select("_xq")
        .mapInPandas(gram, "_i int, _j int, _g long")
        .groupBy("_i", "_j")
        .agg(F.sum("_g").alias("_a"))
        .collect()  # bounded: d² skinny rows (README collect audit)
    )
    a = [[0] * d for _ in range(d)]
    for r in pairs:
        a[r["_i"]][r["_j"]] = r["_a"]

    k = [1_000_000] * d  # all-ones start, scaled 1e6
    for _ in range(iters):
        w = [sum(a[i][j] * k[j] for j in range(d)) for i in range(d)]
        s = max(abs(wi) for wi in w)
        if s == 0:
            break  # zero matrix: projection stays the all-ones sum
        # TRUNCATING division (SQL DIV / DuckDB // semantics); see
        # module docstring — Python's // floors negatives
        k = [
            (abs(wi) * 1_000_000 // s) * (1 if wi >= 0 else -1) for wi in w
        ]

    k_lit = F.lit(k)
    pq = F.aggregate(
        F.zip_with(F.col("_xq"), k_lit, lambda x, kk: x * kk),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    return base.select(
        F.col(id_col),
        pq.alias("pc1_q"),
        (pq.cast("double") / F.lit(q * 1e6)).alias("pc1"),
    )


def jl_project(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    d_out: int = 8,
    coord_quant: int = 10_000,
    salt: str = "jl",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with the
    database-friendly ±1 projection matrix (Achlioptas 2003: entries
    s_jd ∈ {+1, −1} uniformly preserve pairwise distances within
    (1 ± ε) at d_out = O(log n / ε²), no Gaussians needed). The
    reduced vectors feed the ANN / k-means / SemDeDup machines at a
    fraction of the storage and dot-product cost — the published
    pre-step for embedding pipelines whose native dimension is
    larger than the similarity task needs.

    Returns one row per (vector, output dimension): (id_col, jl_dim
    INT, jl_q BIGINT) — jl_q the EXACT integer projection
    Σ_d xq_d · s_jd of the floor-quantized coordinates (the pca
    discipline: engine-exact, zero transcendentals; divide by
    coord_quant for the real-valued coordinate). The sign matrix is
    derived ONCE on the driver from md5(salt, j, d) parity — d_out×d
    integers riding the plan as literals (the classifier-weights
    stance; at the published d_out = O(log n) this is hundreds of
    literals, never corpus-sized) — so ANY engine given the same
    matrix replays every projection bit-for-bit.

    Spark shape: ONE pure projection, no shuffle, no Python —
    per-dimension zip_with/aggregate folds inside whole-stage
    codegen. Rows with NULL vectors are excluded; mixed
    dimensionalities raise (the pca_project contract)."""
    if d_out <= 0:
        raise ValueError(f"need d_out > 0, got {d_out}")
    if coord_quant <= 0:
        raise ValueError(f"need coord_quant > 0, got {coord_quant}")
    q = float(coord_quant)
    xq = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * F.lit(q) + F.lit(0.5)).cast("long"),
    )
    base = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col), xq.alias("_xq")
    )
    dims_rows = base.select(F.size("_xq").alias("_d")).distinct().collect()
    if not dims_rows:
        raise ValueError("jl_project: no non-null vectors")
    if len(dims_rows) > 1:
        raise ValueError(
            f"jl_project: mixed dimensionalities {sorted(r['_d'] for r in dims_rows)}"
        )
    d = dims_rows[0]["_d"]
    signs = jl_signs(d, d_out, salt)
    projs = F.array(
        *[
            F.struct(
                F.lit(j).alias("jl_dim"),
                F.aggregate(
                    F.zip_with(
                        F.col("_xq"),
                        F.lit(signs[j]),
                        lambda x, s: x * s,
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, t: acc + t,
                ).alias("jl_q"),
            )
            for j in range(d_out)
        ]
    )
    return base.select(F.col(id_col), F.explode(projs).alias("_p")).select(
        id_col, F.col("_p.jl_dim"), F.col("_p.jl_q")
    )


def jl_signs(d: int, d_out: int, salt: str = "jl") -> list[list[int]]:
    """The ±1 sign matrix ``jl_project`` embeds — exposed so oracles
    and callers building the SQL replay share the exact literals."""
    import hashlib

    def sign(j: int, dd: int) -> int:
        h = hashlib.md5(f"{salt}:{j}:{dd}".encode()).hexdigest()
        return 1 if int(h[:2], 16) % 2 == 0 else -1

    return [[sign(j, dd) for dd in range(d)] for j in range(d_out)]


__all__ = ["jl_project", "jl_signs", "pca_project"]
