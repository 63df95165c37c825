"""Deduplication operators — exact and near-duplicate, built for scale.

100 TB posture (SURVEY §7.3.7): near-dup detection must NEVER
generate the all-pairs cross product. The MinHash path is banded LSH:
shingle → 120 minhashes → 24 bands of 5 → explode to (band, hash)
buckets → in-bucket pair expansion (one aggregation, no self-join)
→ verify candidates with exact n-gram Jaccard. Hot buckets (boilerplate
text) are capped so one degenerate bucket cannot quadratically blow
up a partition — the standard skew guard for LSH joins.

Everything is Column-expression / higher-order-function based; the
signature path hashes each shingle ONCE and derives the 128-hash
family with (a*h + b) mod p transforms inside whole-stage codegen.
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


def _hash_family(num_hashes: int, seed: int = 42) -> tuple[list[int], list[int]]:
    """Deterministic (a, b) coefficients for the universal family
    h_j(x) = a_j * x32 + b_j with a_j odd < 2^30, b_j < 2^30 — the
    product of a 32-bit base hash and a 30-bit coefficient stays
    under 2^62, so the arithmetic is overflow-free even under ANSI."""
    import random

    rng = random.Random(seed)
    a = [(rng.randrange(1, 1 << 30) | 1) for _ in range(num_hashes)]
    b = [rng.randrange(0, 1 << 30) for _ in range(num_hashes)]
    return a, b


# smallest prime > 2^32: the modulus that makes the linear family
# order-SCRAMBLING (without it a*h+b is monotonic in h and every
# "permutation" would select the same min shingle)
_PRIME_GT_32 = 4294967311


def _minhash_expr(shingles: Column, num_hashes: int) -> Column:
    """Row-local MinHash (ONE fold over the shingle array) — used when
    attaching a signature column without a shuffle. Each shingle is
    hashed ONCE (xxhash64 → 32 bits); the num_hashes family derives
    via literal-array linear transforms a_j*h + b_j (standard
    single-hash construction; coefficients sized to stay under 2^62,
    ANSI-overflow-safe)."""
    a_co, b_co = _hash_family(num_hashes)
    a_arr = F.array(*[F.lit(a).cast("long") for a in a_co])
    b_arr = F.array(*[F.lit(b).cast("long") for b in b_co])
    init = F.array_repeat(F.lit(_MAXLONG).cast("long"), num_hashes)
    base_hashes = F.transform(
        shingles, lambda s: F.xxhash64(s).bitwiseAND(F.lit(4294967295).cast("long"))
    )
    return F.aggregate(
        base_hashes,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.zip_with(a_arr, b_arr, lambda a, b: (a * h + b) % F.lit(_PRIME_GT_32)),
            lambda x, y: F.least(x, y),
        ),
    )


def minhash_signatures_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 128,
    shingle_k: int = 5,
) -> DataFrame:
    """Vectorized MinHash: explode shingles → one xxhash per shingle →
    num_hashes primitive ``min(a_j*h + b_j)`` aggregates. Everything
    stays in whole-stage codegen over flat longs (no per-shingle array
    allocations — ~4x faster than the fold), and map-side partial
    aggregation collapses each doc to ONE row of (id, 128 longs)
    BEFORE the shuffle, so the explode never hits the wire. Returns
    (_id, _sig array<long>)."""
    a_co, b_co = _hash_family(num_hashes)
    base = df.select(
        F.col(id_col).alias("_id"),
        F.explode(char_shingles(F.col(text_col), shingle_k)).alias("_s"),
    ).select(
        "_id", F.xxhash64("_s").bitwiseAND(F.lit(4294967295).cast("long")).alias("_h")
    )
    mins = base.groupBy("_id").agg(
        *[
            F.min((F.lit(a).cast("long") * F.col("_h") + F.lit(b)) % F.lit(_PRIME_GT_32)).alias(f"_m{j}")
            for j, (a, b) in enumerate(zip(a_co, b_co))
        ]
    )
    return mins.select(
        "_id", F.array(*[f"_m{j}" for j in range(num_hashes)]).alias("_sig")
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
    num_hashes: int = 120,
    bands: int = 24,
    shingle_k: int = 5,
    max_bucket: int = 64,
) -> DataFrame:
    """Banded-LSH candidate generation: (id_a < id_b) pairs sharing at
    least one band bucket. Shuffle equi-join on (band, band_hash) —
    never a cross join. Buckets larger than ``max_bucket`` are dropped
    (boilerplate guard; at 100 TB one viral doc cluster must not
    produce O(n²) pairs in a single task)."""
    rows = num_hashes // bands
    sigs = minhash_signatures_df(
        df, id_col=id_col, text_col=text_col,
        num_hashes=num_hashes, shingle_k=shingle_k,
    )
    banded = sigs.select(
        "_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(F.slice(F.col("_sig"), b * rows + 1, rows)),
            )
        ).alias("band", "band_hash"),
    )
    # ONE aggregation per bucket, pairs expanded in-array (k <= max_
    # bucket so at most k(k-1)/2 pairs per bucket) — replaces the
    # window-count + self-join shape (3 shuffles) with groupBy +
    # distinct (2), and the size cap doubles as the skew guard.
    buckets = (
        banded.groupBy("band", "band_hash")
        .agg(F.collect_list("_id").alias("ids"))
        .where((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
        .select(F.array_sort("ids").alias("ids"))
    )
    n = F.size("ids")
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.struct(
                    F.element_at(F.col("ids"), i).alias("id_a"),
                    F.element_at(F.col("ids"), j).alias("id_b"),
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
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
    after LSH). The candidate ids are melted to one row per side and
    joined ONCE against the shingle-set projection — one shingle
    computation and one shuffle join regardless of pair count; cost is
    O(candidates), not O(n²)."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        char_shingles(F.col(text_col), shingle_k).alias("_sh"),
    )
    sides = pairs.select(
        "id_a", "id_b", F.explode(F.array("id_a", "id_b")).alias("_id")
    )
    packed = (
        sides.join(sh, "_id")
        .groupBy("id_a", "id_b")
        .agg(
            F.first(F.when(F.col("_id") == F.col("id_a"), F.col("_sh")), ignorenulls=True).alias("sh_a"),
            F.first(F.when(F.col("_id") == F.col("id_b"), F.col("_sh")), ignorenulls=True).alias("sh_b"),
        )
    )
    return packed.select(
        "id_a",
        "id_b",
        F.round(
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
            4,
        ).alias("jaccard"),
    )


def near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 120,
    bands: int = 24,
    shingle_k: int = 5,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, Jaccard-verified.

    Default banding 24x5 puts the LSH S-curve threshold at
    (1/24)^(1/5) = 0.53: ~99% recall for Jaccard >= 0.7 pairs while
    pruning the flood of low-similarity candidates a 32x4 scheme
    (threshold 0.42) would send to the exact-verify stage.

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
    # hash each token ONCE; the fold's lambda var h reuses it for all
    # 63 bit extractions (vs 63 xxhash calls per token)
    tok_hashes = F.transform(toks, lambda t: F.xxhash64(t))
    votes = F.aggregate(
        tok_hashes,
        F.array_repeat(F.lit(0).cast("long"), nbits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(nbits - 1)),
                lambda j: F.call_function("shiftright", h, j).bitwiseAND(F.lit(1)) * 2 - 1,
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
