"""Deduplication operators — exact and near-duplicate, built for scale.

100 TB posture (SURVEY §7.3.7): near-dup detection must NEVER
generate the all-pairs cross product. The MinHash path is banded LSH:
shingle → 128 minhashes → 32 bands of 4 → explode to (band, hash)
buckets → self-join on the bucket key (a plain shuffle equi-join) →
verify candidates with exact n-gram Jaccard. Hot buckets (boilerplate
text) are capped so one degenerate bucket cannot quadratically blow
up a partition — the standard skew guard for LSH joins.

Everything is Column-expression / higher-order-function based: the
128 hash family is one ``aggregate`` fold over the shingle array (one
pass), not 128 scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..core.errors import ERROR_COL, ensure_error_column, is_ok, null_error
from ..core.step import Step

_MAXLONG = (1 << 63) - 1


def exact_dedup(
    name: str = "exact-dedup",
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> Step:
    """Exact deduplication via content-hash group-by; keeps the row
    with the smallest id per content key (deterministic, unlike
    ``dropDuplicates``). Map-side partial aggregation means only one
    (hash → min id) pair per key per partition crosses the shuffle."""

    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        ok = ensure_error_column(df).where(is_ok()).drop(ERROR_COL)
        text = F.col(text_col)
        key = F.md5(F.regexp_replace(F.lower(text), r"\s+", " ")) if normalize else F.md5(text)
        keyed = ok.withColumn("_pipz_key", key)
        keep = keyed.groupBy("_pipz_key").agg(F.min(id_col).alias(id_col))
        out = keyed.join(keep, ["_pipz_key", id_col], "inner").drop("_pipz_key")
        return out.withColumn(ERROR_COL, null_error())

    return Step(name, fn, node_type="exact_dedup")


def char_shingles(text: Column, k: int = 5) -> Column:
    """Distinct k-character shingles (positions via sequence — one
    expression, no explode)."""
    n = F.greatest(F.length(text) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: text.substr(i, F.lit(k)))
    )


def word_ngrams(text: Column, n: int = 3) -> Column:
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    cnt = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), cnt - 1),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )


def _minhash_expr(shingles: Column, num_hashes: int) -> Column:
    """128-permutation MinHash in ONE fold over the shingle array:
    acc[j] = min(acc[j], xxhash64(shingle, j)). The xxhash64(s, j)
    family (salting with the permutation index) is the standard
    surrogate for independent hash functions."""
    init = F.array_repeat(F.lit(_MAXLONG).cast("long"), num_hashes)
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return F.aggregate(
        shingles,
        init,
        lambda acc, s: F.zip_with(
            acc,
            F.transform(seeds, lambda j: F.xxhash64(s, j)),
            lambda a, b: F.least(a, b),
        ),
    )


def minhash_signature(
    name: str = "minhash",
    text_col: str = "text",
    num_hashes: int = 128,
    shingle_k: int = 5,
) -> Step:
    """Attach ``minhash`` (array<long>, length num_hashes)."""

    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        sig = _minhash_expr(char_shingles(F.col(text_col), shingle_k), num_hashes)
        return df.withColumn("minhash", F.when(is_ok(), sig))

    return Step(name, fn, node_type="minhash", metadata={"num_hashes": num_hashes})


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    max_bucket: int = 64,
) -> DataFrame:
    """Banded-LSH candidate generation: (id_a < id_b) pairs sharing at
    least one band bucket. Shuffle equi-join on (band, band_hash) —
    never a cross join. Buckets larger than ``max_bucket`` are dropped
    (boilerplate guard; at 100 TB one viral doc cluster must not
    produce O(n²) pairs in a single task)."""
    rows = num_hashes // bands
    sig = _minhash_expr(char_shingles(F.col(text_col), shingle_k), num_hashes)
    banded = (
        df.select(F.col(id_col).alias("_id"), sig.alias("_sig"))
        .select(
            "_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.xxhash64(F.slice(F.col("_sig"), b * rows + 1, rows)),
                )
            ).alias("band", "band_hash"),
        )
    )
    sized = banded.withColumn(
        "_bucket_n", F.count("*").over(Window.partitionBy("band", "band_hash"))
    ).where(F.col("_bucket_n") <= max_bucket)
    a = sized.select(F.col("_id").alias("id_a"), "band", "band_hash")
    b = sized.select(F.col("_id").alias("id_b"), "band", "band_hash")
    return (
        a.join(b, ["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (the verify pass
    after LSH). Joins shingle sets to the (small) candidate set — cost
    is O(candidates), not O(n²)."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        char_shingles(F.col(text_col), shingle_k).alias("_sh"),
    )
    return (
        pairs.join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ).alias("jaccard"),
        )
    )


def near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, Jaccard-verified.

    candidates (banded LSH, equi-join) → exact Jaccard → threshold.
    """
    cand = lsh_candidate_pairs(
        df, id_col=id_col, text_col=text_col,
        num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
    )
    return ngram_jaccard(df, cand, id_col=id_col, text_col=text_col, shingle_k=shingle_k).where(
        F.col("jaccard") >= threshold
    )


def _simhash_expr(text: Column, bits: int = 64) -> Column:
    """SimHash over whitespace tokens: per bit, sum ±1 votes from each
    token's xxhash64; bit = vote > 0. One fold; the bit vector packs
    into a single BIGINT (bit 63 kept zero to stay positive)."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    nbits = min(bits, 63)
    votes = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), nbits),
        lambda acc, t: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(nbits - 1)),
                lambda j: F.call_function("shiftright", F.xxhash64(t), j).bitwiseAND(F.lit(1)) * 2 - 1,
            ),
            lambda a, v: a + v,
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes,
            F.sequence(F.lit(0), F.lit(nbits - 1)),
            lambda v, j: F.when(v > 0, F.call_function("shiftleft", F.lit(1).cast("long"), j)).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def simhash(name: str = "simhash", text_col: str = "text") -> Step:
    """Attach a 63-bit ``simhash`` column."""

    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        return df.withColumn("simhash", F.when(is_ok(), _simhash_expr(F.col(text_col))))

    return Step(name, fn, node_type="simhash")


def simhash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    blocks: int = 4,
) -> DataFrame:
    """SimHash near-dups via the block trick: split the 64-bit hash
    into ``blocks`` chunks; pairs within Hamming distance < blocks
    must agree on ≥1 chunk (pigeonhole), so candidates come from an
    equi-join on (block, chunk) — again no cross join — then exact
    ``bit_count(a XOR b)`` filters."""
    width = 64 // blocks
    h = df.select(F.col(id_col).alias("_id"), _simhash_expr(F.col(text_col)).alias("_h"))
    chunked = h.select(
        "_id",
        "_h",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(blocks - 1)),
                lambda b: F.call_function("shiftright", F.col("_h"), b * width).bitwiseAND(F.lit((1 << width) - 1)),
            )
        ).alias("block", "chunk"),
    )
    a = chunked.select(F.col("_id").alias("id_a"), F.col("_h").alias("h_a"), "block", "chunk")
    b = chunked.select(F.col("_id").alias("id_b"), F.col("_h").alias("h_b"), "block", "chunk")
    return (
        a.join(b, ["block", "chunk"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


__all__ = [
    "exact_dedup",
    "char_shingles",
    "word_ngrams",
    "minhash_signature",
    "lsh_candidate_pairs",
    "ngram_jaccard",
    "near_dup_pairs",
    "simhash",
    "simhash_near_dup_pairs",
]
