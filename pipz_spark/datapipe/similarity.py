"""Similarity search over an embedding column (array<float>).

Two paths, per the standard scale playbook:

* ``cosine_topk_bruteforce`` — exact baseline. The (small) query set
  is broadcast against the corpus: a broadcast nested-loop join whose
  cost is |queries| × |corpus| dot products, all inside codegen —
  correct for recall evaluation and for small query batches. The
  corpus is scanned ONCE; there is no shuffled cross join.
* ``cosine_topk_lsh`` — the 100 TB path: random-hyperplane LSH
  (sign-bit signatures from fixed seeded planes) buckets the corpus;
  queries probe only their own bucket (equi-join on the signature),
  so the pair count drops from |Q|·N to |Q|·bucket_size. Recall is
  tunable via ``bits`` (fewer bits → bigger buckets → higher recall).

Dot products are ``zip_with``/``aggregate`` folds in DOUBLE — JVM
expressions, deterministic order, no Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (broadcast the queries;
    single corpus scan; per-query k via one window on qid)."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("_qv"))
    )
    pairs = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("_nv")).join(
        q, F.col("nid") != F.col("qid")
    )
    scored = pairs.select(
        "qid",
        "nid",
        F.round(cosine_similarity(F.col("_qv"), F.col("_nv")), 6).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("qid", "nid", "cos", F.col("_rn").alias("rank"))
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (numpy on the
    driver only; shipped as literals into the plan)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim).tolist()


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature packed into one BIGINT: bit i = dot(v, p_i) > 0."""
    v = vec.cast("array<double>")
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        pl = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(v, pl) > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(bit)
    return sig


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 4,
    tables: int = 16,
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE hyperplane LSH: ``tables``
    independent signatures per vector (different seeded planes);
    candidates = pairs agreeing in ANY table (union via one
    posexplode + equi-join on (table, signature)); exact cosine +
    per-query top-k on the candidate set only.

    Multi-table probing is what makes hyperplane LSH usable — one
    table at ``bits`` b has per-neighbor recall (1-θ/π)^b, while L
    tables lift it to 1-(1-(1-θ/π)^b)^L. Cost stays |pairs sharing a
    bucket|, never |Q|·N; the join is a plain shuffle equi-join AQE
    can skew-split. At 1000 executors the signature pass is
    embarrassingly parallel."""
    if dim is None:
        first = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
        dim = int(first["d"])
    all_planes = [_hyperplanes(dim, bits, seed + t) for t in range(tables)]

    def signatures(vec: Column) -> Column:
        return F.array(*[lsh_signature(vec, p) for p in all_planes])

    def bucketed(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(out_vec),
            F.posexplode(signatures(F.col(vec_col))).alias("_tbl", "_sig"),
        )

    c = bucketed(corpus, "nid", "_nv")
    q = bucketed(queries, "qid", "_qv")
    pairs = (
        c.join(q, ["_tbl", "_sig"])
        .where(F.col("nid") != F.col("qid"))
        .select("qid", "nid", "_qv", "_nv")
        .dropDuplicates(["qid", "nid"])
    )
    scored = pairs.select(
        "qid",
        "nid",
        F.round(cosine_similarity(F.col("_qv"), F.col("_nv")), 6).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("qid", "nid", "cos", F.col("_rn").alias("rank"))
    )


__all__ = [
    "cosine_similarity",
    "cosine_topk_bruteforce",
    "cosine_topk_lsh",
    "lsh_signature",
]
