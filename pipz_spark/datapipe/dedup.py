"""Deduplication operators — exact and near-duplicate, built for scale.

100 TB posture (SURVEY §7.3.7): near-dup detection must NEVER
generate the all-pairs cross product. The MinHash path is banded LSH:
shingle → 120 minhashes → 24 bands of 5 → explode to (band, hash)
buckets → in-bucket pair expansion (one aggregation, no self-join)
→ verify candidates with exact n-gram Jaccard. Hot buckets (boilerplate
text) are capped so one degenerate bucket cannot quadratically blow
up a partition — the standard skew guard for LSH joins.

String work (shingling, base hashing) stays JVM-side in whole-stage
codegen; the dense (a*h + b) mod p minima run as Arrow-batched numpy
— each layer where it is fastest, nothing row-at-a-time in Python.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .graph import connected_components

from ..core.errors import ERROR_COL, ensure_error_column, is_ok, null_error
from .text import WS
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
    (hash → min id) pair per key per partition crosses the shuffle.

    Errored rows are exempt from dedup and PASS THROUGH unchanged (the
    schema is row-identity-preserving), so upstream dead letters still
    reach the sink — fail-fast skips a row, it never deletes it."""

    def fn(df: DataFrame, path: tuple[str, ...]) -> DataFrame:
        df = ensure_error_column(df)
        failed = df.where(~is_ok())
        ok = df.where(is_ok()).drop(ERROR_COL)
        text = F.col(text_col)
        key = F.md5(F.regexp_replace(F.lower(text), WS, " ")) if normalize else F.md5(text)
        # NULL text → NULL md5 would never match itself in the equi-
        # join and the row would silently vanish; coalesce to a
        # sentinel so NULL-text rows form one dedup group (matching
        # SQL GROUP BY, which groups NULLs together)
        key = F.coalesce(key, F.lit("__pipz_null__"))
        keyed = ok.withColumn("_pipz_key", key)
        keep = keyed.groupBy("_pipz_key").agg(F.min(id_col).alias("_pipz_keep_id"))
        # NULL-SAFE id equality (r7 review finding): min() skips NULL
        # ids, so a group whose ids are ALL NULL gets keeper id NULL —
        # a null-rejecting equi-join deleted the whole group (unique
        # content, silently gone). With <=> an all-NULL-id group keeps
        # its rows (no id exists to elect one keeper by — documented);
        # a mixed group still drops its NULL-id rows as duplicates of
        # the non-NULL keeper, which IS dedup behavior.
        out = (
            keyed.join(
                keep,
                (keyed["_pipz_key"] == keep["_pipz_key"])
                & keyed[id_col].eqNullSafe(keep["_pipz_keep_id"]),
                "left_semi",
            )
            .drop("_pipz_key")
        )
        return out.withColumn(ERROR_COL, null_error()).unionByName(failed)

    return Step(name, fn, node_type="exact_dedup")


def char_shingles(text: Column, k: int = 5) -> Column:
    """Distinct k-character shingles (positions via sequence — one
    expression, no explode)."""
    n = F.greatest(F.length(text) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: text.substr(i, F.lit(k)))
    )


def gram_array(text: Column, n: int = 3) -> Column:
    """NON-distinct lowercased word n-grams, in document order. The
    single source of truth for gram construction — word_ngrams (the
    distinct set) and ngram_repetition (occurrence counts) both build
    on it, so the short-doc fallback (a doc below ``n`` tokens
    contributes its whole text as one gram) cannot drift between
    consumers."""
    toks = F.split(F.trim(F.lower(text)), WS)
    cnt = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), cnt - 1),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )


def word_ngrams(text: Column, n: int = 3) -> Column:
    return F.array_distinct(gram_array(text, n))


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
    """Hybrid MinHash: shingling + base hashing stay JVM-side (string
    work belongs in codegen — one xxhash64 per shingle), then the
    (a*h+b) % p minima come from an Arrow-batched numpy UDF: one
    (num_hashes x n_shingles) broadcasted multiply-min per document.
    Dense integer math is where numpy beats both an expression fold
    (per-shingle array allocations) and a 120-aggregate groupBy
    (codegen planning alone cost seconds). Per-partition work, no
    shuffle (fan_out only rebalances when the scan under-partitions
    — a one-file table must not serialize the minima on one core).
    Returns (_id, _sig array<long>)."""
    import numpy as np

    from ._util import fan_out

    df = fan_out(df)

    a_co, b_co = _hash_family(num_hashes)
    a_vec = np.array(a_co, dtype="int64")[:, None]
    b_vec = np.array(b_co, dtype="int64")[:, None]

    @F.pandas_udf("array<bigint>")
    def min_udf(hs: pd.Series) -> pd.Series:
        sentinel = np.full(num_hashes, _MAXLONG, dtype="int64")
        out = []
        for h in hs:
            # NULL/empty text must degrade to a sentinel signature,
            # never a task failure (one poison row can't fail the job)
            if h is None or len(h) == 0:
                out.append(sentinel)
                continue
            hv = np.asarray(h, dtype="int64")[None, :]
            out.append(((a_vec * hv + b_vec) % _PRIME_GT_32).min(axis=1))
        return pd.Series(out)

    base_hashes = F.transform(
        char_shingles(F.col(text_col), shingle_k),
        lambda s: F.xxhash64(s).bitwiseAND(F.lit(4294967295).cast("long")),
    )
    return df.select(
        F.col(id_col).alias("_id"), min_udf(base_hashes).alias("_sig")
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


def _bucket_pairs(bucketed: DataFrame, keys: list[str], max_bucket: int) -> DataFrame:
    """(id_a < id_b) pairs co-bucketed on ``keys``, EXHAUSTIVE and
    skew-safe. One aggregation builds the sorted id list per bucket
    (persisted — both size classes read it; release via
    ``datapipe.release_caches()``), then the plan forks on bucket
    size:

    * ≤ ``max_bucket``: pairs expand IN-ARRAY — k(k-1)/2 structs in
      the bucket's own row, one task, no join. The fast path for the
      overwhelmingly common small bucket.
    * >  ``max_bucket``: the bucket's ids re-explode and SELF-JOIN on
      (bucket key, SALT): the right side salts each position by
      ``_j mod ceil(k/max_bucket)`` and the left side replicates into
      every salt, so one hot bucket's k² pairs land in ~k/max_bucket
      shuffle partitions of ≤ k·max_bucket pairs each — a DETERMINISTIC
      split, not a hope that AQE notices (it would not: skew-join
      splits on shuffle INPUT bytes, and a hot bucket's input is k
      skinny rows while its OUTPUT is k² — invisible to the
      heuristic). Replication cost is k²/max_bucket extra skinny rows,
      vanishing next to the pairs themselves. A viral boilerplate
      cluster now costs what it costs, spread across tasks, rather
      than losing genuine near-dup pairs (r3 ADVICE: recall hole) or
      serializing k² in one task.

    The cap therefore selects the PLAN SHAPE, never the recall."""
    from . import _caches

    grouped = _caches.track(
        bucketed.groupBy(*keys)
        .agg(F.array_sort(F.collect_list("_id")).alias("ids"))
        .where(F.size("ids") >= 2)
        .persist()
    )
    # eager materialization: the small and big branches are separate
    # stages the scheduler may launch CONCURRENTLY — before the cache
    # is populated, each would recompute the full bucket aggregation.
    # The pinning action doubles as the plan-shape probe: the global
    # max bucket size costs the same full scan a bare count() did, and
    # when NO bucket exceeds the cap (the overwhelmingly common case —
    # every bucket at sf0.01/0.1) the big branch, its self-join, and
    # the union are never built at all, so the common case pays zero
    # empty-stage overhead (r4 regression: +23-34% on the minhash/
    # simhash queries from scheduling the always-empty big branch).
    max_size = (
        grouped.agg(F.max(F.size("ids")).alias("mx")).first()["mx"] or 0
    )
    small = (
        grouped
        if max_size <= max_bucket
        else grouped.where(F.size("ids") <= max_bucket)
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
    small_pairs = small.select(F.explode(pair_structs).alias("p")).select(
        F.col("p.id_a"), F.col("p.id_b")
    )
    if max_size <= max_bucket:
        # distinct stays: the same pair can co-bucket under several
        # keys (bands / pigeonhole chunks), whatever the plan shape
        return small_pairs.distinct()
    big = grouped.where(F.size("ids") > max_bucket)
    nsplit = F.ceil(F.size("ids") / F.lit(max_bucket)).cast("int")
    # pair (i, j) joins exactly once: the j side carries salt j mod ns,
    # the i side is replicated into every salt of its bucket. The
    # member explode and the ×ns salt replication are SEPARATE stages
    # with a repartition between them: a bucket's ids live in ONE
    # array row, so without the spread the task holding a k-member
    # bucket would single-handedly generate all k·⌈k/max_bucket⌉
    # replicated rows (measured at the megabucket stress: the 100k
    # bucket's 39M-row explosion serialized on one core for minutes
    # while 63 tasks sat idle). The partition count is EXPLICIT
    # because AQE must not re-collapse it: the exchange carries only
    # the k skinny member rows (~2 MB at k=100k), so size-based
    # partition coalescing — blind to the ×ns downstream blow-up for
    # the same input-vs-output reason as the skew-join heuristic —
    # merged the unnumbered form back into one partition and
    # resurrected the straggler (measured on the first fix attempt)
    nparts = bucketed.sparkSession.sparkContext.defaultParallelism
    e_a = (
        big.select(
            *keys, nsplit.alias("_ns"), F.posexplode("ids").alias("_i", "id_a")
        )
        .repartition(nparts, F.col("_i"))
        .select(
            *keys,
            "_i",
            "id_a",
            F.explode(F.sequence(F.lit(0), F.col("_ns") - 1)).alias("_s"),
        )
    )
    e_b = big.select(
        *keys, nsplit.alias("_ns"), F.posexplode("ids").alias("_j", "id_b")
    ).select(*keys, "_j", "id_b", (F.col("_j") % F.col("_ns")).alias("_s"))
    big_pairs = (
        e_a.join(e_b, [*keys, "_s"])
        .where(F.col("_i") < F.col("_j"))
        .select("id_a", "id_b")
    )
    return small_pairs.unionByName(big_pairs).distinct()


def _cross_bucket_pairs(
    nb: DataFrame, rb: DataFrame, keys: list[str], max_bucket: int = 1024
) -> DataFrame:
    """(new_id, ref_id) pairs co-bucketed on ``keys``, STRICTLY
    cross-side, exhaustive and skew-safe — the two-corpus sibling of
    ``_bucket_pairs``, sharing its core analysis: a hot bucket's
    shuffle INPUT is skinny rows while its OUTPUT is |new|·|ref|
    pairs, invisible to AQE's input-byte skew heuristic, so any split
    must be deterministic.

    Plan fork, decided by two SKINNY count aggregations (map-side
    partials — the common no-hot-bucket case pays only those, never
    an array build):

    * every co-occupied bucket ≤ ``max_bucket`` per side: one plain
      equi-join on ``keys`` — the r6-measured fast path.
    * oversized buckets (tiny broadcast set): routed out by semi/anti
      joins and joined on (keys, salt_n, salt_r) — each side salts by
      xxhash64(id) mod ⌈side/max_bucket⌉ and replicates across the
      OTHER side's salts, bounding every task's pair output at
      ~max_bucket² whatever the bucket sizes. The cap selects the
      PLAN SHAPE, never recall."""
    from . import _caches

    sizes = (
        nb.groupBy(*keys).agg(F.count(F.lit(1)).alias("_nn"))
        .join(rb.groupBy(*keys).agg(F.count(F.lit(1)).alias("_nr")), keys)
    )
    big_keys = _caches.track(
        sizes.where((F.col("_nn") > max_bucket) | (F.col("_nr") > max_bucket)).persist()
    )
    has_big = big_keys.limit(1).count() > 0
    if not has_big:
        return (
            nb.join(rb, keys).select("new_id", "ref_id").dropDuplicates()
        )
    bk = F.broadcast(big_keys)
    nb_small = nb.join(bk.select(*keys), keys, "left_anti")
    rb_small = rb.join(bk.select(*keys), keys, "left_anti")
    small_pairs = nb_small.join(rb_small, keys).select("new_id", "ref_id")
    nsn = F.ceil(F.col("_nn") / F.lit(max_bucket)).cast("int")
    nsr = F.ceil(F.col("_nr") / F.lit(max_bucket)).cast("int")
    nb_big = (
        nb.join(bk, keys)
        .select(
            *keys,
            "new_id",
            F.pmod(F.xxhash64("new_id"), nsn).cast("int").alias("_sn"),
            F.explode(F.sequence(F.lit(0), nsr - 1)).alias("_sr"),
        )
    )
    rb_big = (
        rb.join(bk, keys)
        .select(
            *keys,
            "ref_id",
            F.explode(F.sequence(F.lit(0), nsn - 1)).alias("_sn"),
            F.pmod(F.xxhash64("ref_id"), nsr).cast("int").alias("_sr"),
        )
    )
    big_pairs = nb_big.join(rb_big, [*keys, "_sn", "_sr"]).select("new_id", "ref_id")
    return small_pairs.unionByName(big_pairs).dropDuplicates()


def _minhash_estimate_filter(
    cand: DataFrame,
    sigs_a: DataFrame,
    sigs_b: DataFrame,
    key_a: str,
    key_b: str,
    threshold: float,
    num_hashes: int,
) -> DataFrame:
    """Prune candidate pairs by the MinHash Jaccard ESTIMATE (fraction
    of agreeing signature slots) at ``threshold`` minus a 3σ margin —
    the shared middle stage of both the self-join (``near_dup_pairs``)
    and cross-corpus (``cross_near_dup_pairs``) paths; one definition
    so the margin/estimator can never drift between them. The margin
    keeps every true pair (the exact verify downstream is the final
    word); the filter exists because the estimate moves 2·num_hashes
    longs per candidate while the verify moves whole shingle arrays."""
    margin = 3.0 / (num_hashes ** 0.5)
    return (
        cand.join(sigs_a.select(F.col("_id").alias(key_a), F.col("_sig").alias("_sa")), key_a)
        .join(sigs_b.select(F.col("_id").alias(key_b), F.col("_sig").alias("_sb")), key_b)
        .withColumn(
            "_est",
            F.size(F.filter(F.zip_with("_sa", "_sb", lambda a, b: a == b), lambda x: x))
            / F.lit(num_hashes),
        )
        .where(F.col("_est") >= threshold - margin)
        .select(key_a, key_b)
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 120,
    bands: int = 24,
    shingle_k: int = 5,
    max_bucket: int = 256,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Banded-LSH candidate generation: (id_a < id_b) pairs sharing at
    least one band bucket. Shuffle equi-join on (band, band_hash) —
    never a cross join. ``max_bucket`` picks the pair-expansion plan
    per bucket size (see ``_bucket_pairs``); no bucket is dropped, so
    banding recall is exactly the S-curve, with no silent cap."""
    if sigs is None:
        sigs = minhash_signatures_df(
            df, id_col=id_col, text_col=text_col,
            num_hashes=num_hashes, shingle_k=shingle_k,
        )
    banded = banded_signatures(sigs, num_hashes=num_hashes, bands=bands)
    return _bucket_pairs(banded, ["band", "band_hash"], max_bucket)


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    gram_fn: "Callable[[Column], Column] | None" = None,
) -> DataFrame:
    """Exact gram-set Jaccard for candidate pairs (the verify pass
    after LSH). ``gram_fn`` selects the set construction — default
    char shingles of ``shingle_k`` (the MinHash path's unit); pass
    e.g. ``lambda t: word_ngrams(t, 5)`` to verify on word n-grams
    instead. The gram-set projection is computed once for only
    the documents that appear in a candidate pair (semi-join prune),
    persisted, and joined to each side of the skinny pair list — the
    intersect streams through the join output with no array-valued
    aggregation anywhere.

    (The previous melt + groupBy-pack shape made one join but forced
    the shingle arrays through a first()-aggregate: a sort-based
    aggregation copying ~KB arrays per row — at 10× scale a uniform
    ~16 s/task and 660 MB of array shuffle. Two sort-merge joins
    against the cached projection shuffle the arrays once per side at
    |relevant docs| rows, not |pair sides| rows.) Cost stays
    O(candidates), never O(n²)."""
    from . import _caches

    # the pair list feeds BOTH the relevance prune and the verify
    # joins; without a pinned cache each consumer recomputes the
    # upstream candidate/estimate stages (skinny rows — cheap to hold)
    from ._util import fan_out

    # persisted but NOT eagerly pinned: the first action that touches
    # it (sh's pin below) references sides exactly ONCE — through the
    # semi-join's build side — so it materializes race-free as a side
    # effect of that action; the verify joins then read the filled
    # cache. An eager count() here was a whole extra driver-blocking
    # job per query (~0.5 s of scheduling at sf0.1) buying nothing.
    sides = _caches.track(pairs.select("id_a", "id_b").persist())
    relevant = fan_out(df).join(
        sides.select(F.explode(F.array("id_a", "id_b")).alias("_id")).distinct(),
        F.col(id_col) == F.col("_id"),
        "left_semi",
    )
    gexpr = (
        gram_fn(F.col(text_col))
        if gram_fn is not None
        else char_shingles(F.col(text_col), shingle_k)
    )
    sh = _caches.track(
        relevant.select(F.col(id_col).alias("_id"), gexpr.alias("_sh")).persist()
    )
    sh.count()  # pin before both join sides race the cache
    joined = sides.join(
        sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a")), "id_a"
    ).join(sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b")), "id_b")
    # quantize4, NOT round(·, 4): round's double tie handling
    # diverges between Spark and DuckDB (see text.quantize4's
    # docstring — a real sf0.1 divergence); every threshold filter
    # downstream compares the quantized value, so the quantizer must
    # be the engine-portable floor form (r6 advisor finding)
    from .text import quantize4

    return joined.select(
        "id_a",
        "id_b",
        quantize4(
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b"))
        ).alias("jaccard"),
    )


def jaccard_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    max_doc_freq: int = 64,
    max_bucket: int = 256,
) -> DataFrame:
    """Exact word-n-gram Jaccard near-duplicate pairs — the
    deterministic sibling of the MinHash path (SURVEY §2.5's "n-gram
    Jaccard" dedup method as its own operator, not just the LSH verify
    pass).

    Candidate pairs = documents sharing at least one n-gram whose
    document frequency lies in [2, ``max_doc_freq``]. The df-cap is
    PART OF THE SEMANTICS (the declared oracle applies the same rule),
    not a lossy shortcut: a gram in thousands of documents is
    boilerplate — it generates O(df²) candidates while adding one
    element to an intersection, so capping it bounds every gram's
    pair fan-out a priori. Long grams (n=5 words) are selective
    enough that real near-dups still share many sub-cap grams:
    measured at sf0.1, cap 64 yields 1.5k candidates for 256 true
    pairs, vs 1.1M candidates for 3-grams uncapped-ish (cap 128).
    Verification then scores the FULL distinct gram sets (the cap
    gates candidate GENERATION only), reusing ``ngram_jaccard``'s
    semi-join-pruned projection.

    Scale shape: gram explode (HASHED to 64-bit at the source — the
    df count, semi-join, and pair buckets all key on ``xxhash64(gram)``
    longs, never the ~40-byte gram strings; measured 15s → ~4s at
    sf0.1 from the shuffle payload alone, and at 100 TB shuffling raw
    5-word strings three times would dominate the job) → df-cap
    semi-join → ``_bucket_pairs`` (in-array expansion for small gram
    buckets, deterministically salted self-join above the cap — the
    same skew-safe machine as the LSH band buckets) → two joins of the
    skinny pair list against the cached gram-set projection. Never
    all-pairs; every stage is a bucketed equi-join or a map-side
    projection. A 64-bit collision can only (a) nudge a df count or
    (b) admit a spurious CANDIDATE — which the exact verify on the
    real gram sets then scores honestly, so the output is wrong only
    if a collision bridges a pair whose every true shared gram is
    over-cap AND whose Jaccard clears the threshold: ~(n_grams²/2⁶⁴)
    times an already-rare setup, accepted and documented."""
    from . import _caches
    from ._util import fan_out

    docs = fan_out(df).where(F.trim(F.col(text_col)) != "")
    # consumed twice (df-count aggregation + the semi-join probe);
    # persist the skinny (id, hash) rows so the gram-building string
    # expression runs once
    grams = _caches.track(
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.transform(word_ngrams(F.col(text_col), n), lambda g: F.xxhash64(g))
            ).alias("_g"),
        ).persist()
    )
    # word_ngrams is distinct-per-doc, so count(*) per gram IS the
    # document frequency; grams below 2 pair with nothing and grams
    # above the cap are boilerplate — both pruned before any pairing
    keep = (
        grams.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where((F.col("_df") >= 2) & (F.col("_df") <= max_doc_freq))
    )
    capped = grams.join(keep.select("_g"), "_g", "left_semi")
    pairs = _bucket_pairs(capped, ["_g"], max_bucket)
    scored = ngram_jaccard(
        df.where(F.trim(F.col(text_col)) != ""),
        pairs,
        id_col=id_col,
        text_col=text_col,
        gram_fn=lambda t: word_ngrams(t, n),
    )
    # threshold on the ROUNDED score (ngram_jaccard rounds to 4) so
    # the engine and the oracle gate on the identical value
    return scored.where(F.col("jaccard") >= threshold)


def near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 120,
    bands: int = 24,
    shingle_k: int = 5,
    estimate_filter: bool = True,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, Jaccard-verified.

    Default banding 24x5 puts the LSH S-curve threshold at
    (1/24)^(1/5) = 0.53: ~99% recall for Jaccard >= 0.7 pairs while
    pruning the flood of low-similarity candidates a 32x4 scheme
    (threshold 0.42) would send to the exact-verify stage.

    Three stages, each strictly cheaper than the next is selective:
    banded-LSH candidates (equi-join) → minhash-ESTIMATE filter
    (fraction of agreeing signature slots — unbiased Jaccard
    estimator, sd ~ 1/sqrt(num_hashes)) at threshold minus a 3-sigma
    margin → exact shingle Jaccard for the survivors (two joins
    against a cached shingle projection — see ngram_jaccard). NOTE:
    composing this function RUNS Spark jobs (the cache pins below are
    eager by design) — build it when you intend to execute. Output
    is IDENTICAL with ``estimate_filter`` off (the margin keeps every
    true pair; the verify is the final word); the flag exists because
    the estimate moves 2 × num_hashes longs per candidate, which is
    A/B-measurable: at 10× scale the S-curve admits ~1M
    mid-similarity candidates, the estimate prunes them ~4× for
    660 MB of signature freight, and skipping it pushes 2.7 GB of
    shingle arrays into the verify (124 s vs 55 s wall). Turn it OFF
    only when banding is already selective at your threshold
    (candidates ≈ true pairs).

    ROUTING HEURISTIC (measured at the 100× stress, identical pair
    sets): MinHash pays for itself only when the signature (2 ×
    num_hashes longs ≈ 2 KB at the default 120) is much SMALLER than
    a document's distinct-shingle set — i.e. long documents. On
    short documents (≲ a few hundred distinct shingles ≈ a few
    hundred words) the df-capped word-gram route
    (``jaccard_near_dup_pairs``) produced the SAME 2.25M pairs at
    ~1/5 the wall and ~1/2 the shuffle (167 s / 9.3 GB vs 818 s /
    21.2 GB on 500k short docs), because signature construction +
    banding + estimate freight all cost more than simply moving the
    small shingle sets. Rule of thumb: signature bytes ≥ shingle-set
    bytes ⇒ MinHash buys nothing — use ``jaccard_near_dup_pairs``;
    web-page-sized or longer documents (thousands of distinct
    shingles) ⇒ MinHash's constant-size signatures win. This stays a
    documented caller decision rather than an automatic data-dependent
    switch: the two routes have different recall envelopes
    (banding S-curve vs df-capped candidate generation), and a plan
    that silently changes shape with corpus statistics is exactly
    what the repo's plan-canary discipline exists to prevent."""
    sigs = None
    if estimate_filter:
        from . import _caches

        # persisted: the banding pass and both estimate join sides
        # read it. NOT eagerly pinned: the first action that touches
        # it (_bucket_pairs' grouped pin) reaches sigs exactly ONCE
        # (through the banding explode), so the cache fills race-free
        # inside that action and the estimate joins read the filled
        # cache — the old count() was one whole extra sequential job
        # per query for a cache the very next action fills anyway.
        sigs = _caches.track(
            minhash_signatures_df(
                df, id_col=id_col, text_col=text_col,
                num_hashes=num_hashes, shingle_k=shingle_k,
            ).persist()
        )
    cand = lsh_candidate_pairs(
        df, id_col=id_col, text_col=text_col,
        num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
        sigs=sigs,
    )
    if estimate_filter:
        cand = _minhash_estimate_filter(
            cand, sigs, sigs, "id_a", "id_b", threshold, num_hashes
        )
    return ngram_jaccard(df, cand, id_col=id_col, text_col=text_col, shingle_k=shingle_k).where(
        F.col("jaccard") >= threshold
    )


def banded_signatures(
    sigs: DataFrame,
    num_hashes: int = 120,
    bands: int = 24,
) -> DataFrame:
    """(_id, band, band_hash) banded rows derived from a
    ``minhash_signatures_df`` frame — pure expressions over the
    signature array, so banding is free to recompute wherever the
    signatures are. The SIGNATURE frame is the thing to persist for
    incremental dedup (one compact row per doc); banding parameters
    are part of a stored index's identity — a new batch must band
    with the same family to collide correctly."""
    if num_hashes % bands != 0:
        # silently ignoring the trailing num_hashes % bands slots
        # would compute, shuffle, and discard signatures while
        # shifting the realized S-curve threshold off the advertised
        # (1/bands)^(bands/num_hashes) with no warning (r7 review)
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes} — the "
            "banding S-curve is defined by rows-per-band = num_hashes/bands"
        )
    rows = num_hashes // bands
    return sigs.select(
        "_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(F.slice(F.col("_sig"), b * rows + 1, rows)),
            )
        ).alias("band", "band_hash"),
    )


def cross_near_dup_pairs(
    new: DataFrame,
    ref: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 120,
    bands: int = 24,
    shingle_k: int = 5,
    max_bucket: int = 1024,
    ref_sigs: DataFrame | None = None,
) -> DataFrame:
    """Incremental-crawl dedup: which NEW documents near-duplicate any
    REFERENCE document. The operator every growing corpus needs —
    dedup the incoming batch AGAINST the existing corpus without ever
    re-pairing the corpus with itself.

    Both sides are banded with the SAME seeded MinHash family, so a
    new/ref pair collides exactly as it would inside one corpus.
    The three-stage discipline of ``near_dup_pairs`` applies: banded
    candidates — strictly new×ref via ``_cross_bucket_pairs``, whose
    grid salting bounds every task at max_bucket² pairs even for a
    viral template bucket (output-side skew is invisible to AQE; same
    analysis as ``_bucket_pairs``) — then the shared minhash-ESTIMATE
    filter at threshold minus 3σ (measured 2.4M → ~140k candidates on
    the 10× stress corpus), then exact shingle Jaccard with each side
    semi-join-pruned to the docs that actually appear in a candidate
    (the headline case is a small batch vs a huge corpus — shingling
    the whole reference every batch would dwarf the query itself).
    The two corpora may share id values, so sides never union.

    Pass ``ref_sigs`` — a materialized ``minhash_signatures_df`` frame
    built with the SAME num_hashes/shingle_k — to skip re-signing the
    reference corpus on every incremental batch. The frame is
    validated (signature width must equal ``num_hashes``: mismatched
    families collide on NOTHING and would silently return empty) and
    is used as the caller owns it: this function never persists or
    cache-tracks a caller-supplied index, so ``release_caches()``
    between batches cannot unpersist it.

    Returns (new_id, ref_id, jaccard) at/above ``threshold``.
    """
    from . import _caches
    from ._util import fan_out

    def sign(df: DataFrame) -> DataFrame:
        return minhash_signatures_df(
            df, id_col=id_col, text_col=text_col,
            num_hashes=num_hashes, shingle_k=shingle_k,
        )

    # signatures feed the banding AND the estimate filter — persist
    # the frames THIS call creates (a caller-supplied index is the
    # caller's to manage). No eager pin: _cross_bucket_pairs' sizing
    # action references each signature frame exactly ONCE (through
    # its banding explode), so both caches fill race-free inside the
    # action the plan needs anyway; the estimate joins read the
    # filled caches. The old per-frame count()s were two extra
    # sequential driver-blocking jobs per call.
    sn = _caches.track(sign(new).persist())
    if ref_sigs is not None:
        first = ref_sigs.select(F.size("_sig").alias("_w")).first()
        if first is not None and first["_w"] != num_hashes:
            raise ValueError(
                f"ref_sigs signature width {first['_w']} != num_hashes="
                f"{num_hashes}: the index was built with a different "
                "MinHash family and would collide on nothing"
            )
        sr = ref_sigs
    else:
        sr = _caches.track(sign(ref).persist())

    cand = _cross_bucket_pairs(
        banded_signatures(sn, num_hashes=num_hashes, bands=bands)
        .withColumnRenamed("_id", "new_id"),
        banded_signatures(sr, num_hashes=num_hashes, bands=bands)
        .withColumnRenamed("_id", "ref_id"),
        ["band", "band_hash"],
        max_bucket,
    )
    cand = _caches.track(
        _minhash_estimate_filter(
            cand, sn, sr, "new_id", "ref_id", threshold, num_hashes
        ).persist()
    )
    cand.count()  # pin before the semi-join prune and verify join race it

    def sh_proj(df: DataFrame, out_id: str) -> DataFrame:
        relevant = fan_out(df).join(
            cand.select(F.col(out_id).alias("_cid")).distinct(),
            F.col(id_col) == F.col("_cid"),
            "left_semi",
        )
        return relevant.select(
            F.col(id_col).alias(out_id),
            char_shingles(F.col(text_col), shingle_k).alias(f"_sh_{out_id}"),
        )

    joined = cand.join(sh_proj(new, "new_id"), "new_id").join(
        sh_proj(ref, "ref_id"), "ref_id"
    )
    # same engine-portable quantizer as ngram_jaccard (r6 advisor:
    # the threshold filter on a round(·,4) value carries round's
    # cross-engine tie divergence)
    from .text import quantize4

    jac = quantize4(
        F.size(F.array_intersect("_sh_new_id", "_sh_ref_id"))
        / F.size(F.array_union("_sh_new_id", "_sh_ref_id"))
    )
    return joined.select("new_id", "ref_id", jac.alias("jaccard")).where(
        F.col("jaccard") >= threshold
    )


def _simhash_expr(text: Column, bits: int = 64) -> Column:
    """SimHash over whitespace tokens: per bit, sum ±1 votes from each
    token's xxhash64; bit = vote > 0. One fold; the bit vector packs
    into a single BIGINT (bit 63 kept zero to stay positive)."""
    toks = F.split(F.trim(F.lower(text)), WS)
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


def _token_hash(col: Column, hash_fn: str) -> Column:
    """Base token hash for SimHash. ``xxhash64`` is the fast default;
    ``md5_60`` (first 15 md5 hex chars as a 60-bit integer) is engine-
    portable — any system with md5 reproduces it bit-for-bit, which is
    what lets an external SQL oracle recompute identical signatures."""
    if hash_fn == "xxhash64":
        return F.xxhash64(col)
    if hash_fn == "md5_60":
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def simhash_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 63,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Vectorized SimHash: explode tokens → one base hash each → per
    bit a flat ``sum(±1)`` aggregate → pack. Flat-long codegen with
    map-side combine (one row per doc crosses the shuffle) — the fast
    path for corpus-scale runs; the expression form (`simhash` Step)
    stays for shuffle-free column attachment. Returns (_id, _h)."""
    from ._util import fan_out

    df = fan_out(df)
    toks = F.split(F.trim(F.lower(F.col(text_col))), WS)
    base = df.select(
        F.col(id_col).alias("_id"), F.explode(toks).alias("_t")
    ).select("_id", _token_hash(F.col("_t"), hash_fn).alias("_th"))
    aggs = [
        F.sum(
            F.call_function("shiftright", F.col("_th"), F.lit(j)).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"_v{j}")
        for j in range(bits)
    ]
    votes = base.groupBy("_id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for j in range(bits):
        sig = sig.bitwiseOR(
            F.when(F.col(f"_v{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return votes.select("_id", sig.alias("_h"))


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
    blocks: int | None = None,
    max_bucket: int = 256,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dups via the block trick: split the 64-bit hash
    into ``blocks`` chunks; pairs within Hamming distance < blocks
    must agree on ≥1 chunk (pigeonhole), so candidates come from
    (block, chunk) buckets — again no cross join — then exact
    ``bit_count(a XOR b)`` filters.

    ``blocks`` defaults to the smallest power-of-two divisor of 64
    that EXCEEDS max_hamming — fewer blocks would silently lose
    recall (a pair with its differing bits spread across every chunk
    shares none). An explicit ``blocks`` <= max_hamming is rejected.

    Pigeonhole exhaustiveness is UNCONDITIONAL: ``max_bucket`` only
    picks the pair-expansion plan per bucket size (``_bucket_pairs``
    — in-array for small buckets, skew-splittable self-join for hot
    ones). A degenerate chunk value (boilerplate / near-empty docs
    all voting the same way) costs its true k² — spread across
    tasks — instead of silently losing hamming-1..3 pairs inside a
    >64-doc template cluster (r3 ADVICE)."""
    if blocks is None:
        blocks = next(b for b in (1, 2, 4, 8, 16, 32, 64) if b > max_hamming)
    if blocks <= max_hamming:
        raise ValueError(
            f"blocks={blocks} cannot guarantee candidates for max_hamming={max_hamming}; "
            f"need blocks > max_hamming (pigeonhole)"
        )
    from . import _caches

    width = 64 // blocks
    # one long per doc; read by the chunking pass AND both hash
    # join-backs — persisted like near_dup_pairs' signatures, released
    # deterministically via datapipe.release_caches()
    h = _caches.track(
        simhash_df(df, id_col=id_col, text_col=text_col, hash_fn=hash_fn).persist()
    )
    # no eager pin: the first action (_bucket_pairs' grouped pin)
    # reads h exactly ONCE via the chunking explode, filling the
    # cache race-free; both hash join-backs then read the filled
    # cache — the old count() was an extra sequential job per call

    def chunk_of(b):
        shifted = F.call_function("shiftright", F.col("_h"), b * width)
        if width >= 64:
            return shifted  # whole-hash chunk: no mask (2^64-1 overflows long)
        return shifted.bitwiseAND(F.lit((1 << width) - 1))

    chunked = h.select(
        "_id",
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.lit(blocks - 1)), chunk_of)
        ).alias("block", "chunk"),
    )
    # Size-routed pair expansion (exhaustive — see _bucket_pairs):
    # skinny (id, id) rows only; the hash values join back in AFTER
    # the distinct has collapsed multi-block collisions, so wide
    # payloads never ride the hot join.
    pairs = _bucket_pairs(chunked, ["block", "chunk"], max_bucket)
    return (
        pairs.join(h.select(F.col("_id").alias("id_a"), F.col("_h").alias("h_a")), "id_a")
        .join(h.select(F.col("_id").alias("id_b"), F.col("_h").alias("h_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame | None = None,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-duplicate CLUSTERS with canonical-keeper selection — the
    step an actual training-data pipeline runs after pair generation:
    pairs only say "a duplicates b"; keeping one doc per duplicate
    GROUP requires the transitive closure (a~b, b~c ⇒ drop two of
    {a,b,c}, not one of each pair).

    Returns (id_col, cluster_id, is_keeper) for EVERY input doc:
    cluster_id = the minimum doc id PRESENT IN ``df`` within the
    doc's connected component of the pair graph (docs with no
    near-dup are their own singleton cluster), is_keeper = the
    deterministic survivor choice (min present id). Filter
    ``is_keeper`` to materialize the deduped corpus.

    The representative is recomputed over ``df``'s own ids rather
    than taken from the component label: caller-supplied ``pairs``
    may reference ids that were filtered out of ``df``, and electing
    an absent id as keeper would silently drop the entire duplicate
    group (every present member non-keeper) — the exact data loss
    the operator exists to prevent. Every cluster with at least one
    present member keeps exactly one.
    """
    from . import _caches

    if pairs is None:
        pairs = near_dup_pairs(df, threshold=threshold, id_col=id_col, text_col=text_col)
    comp = connected_components(pairs)
    # pinned: both the representative aggregate and the final join
    # read this corpus-wide join — without the persist the second
    # consumer re-executes it per action (rep is broadcast-small, so
    # no reusable exchange exists on the labeled side)
    labeled = _caches.track(
        df.select(id_col)
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(id_col, F.coalesce("component", F.col(id_col)).alias("_comp"))
        .persist()
    )
    rep = labeled.groupBy("_comp").agg(F.min(id_col).alias("cluster_id"))
    return (
        labeled.join(rep, "_comp")
        .select(id_col, "cluster_id")
        .withColumn("is_keeper", F.col(id_col) == F.col("cluster_id"))
    )


def contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark decontamination: for each training document, count
    the distinct word n-grams it shares with ANY document of an
    evaluation set — the standard pre-training hygiene pass (a train
    doc containing an eval n-gram leaks the benchmark into the
    model). Returns (id, n_collisions) for contaminated docs only;
    anti-join against it to drop them.

    Shape at 100 TB: the train side explodes to (id, gram) — linear
    in corpus token count, the same expansion every shingle pass here
    pays — and the eval side is grams of the BENCHMARK, which is tiny
    by definition (thousands of docs, not billions), deduplicated and
    broadcast (``broadcast_eval=True``): the collision join then
    never shuffles the train side. For an unusually large eval suite
    set ``broadcast_eval=False`` to fall back to a shuffled equi-join
    on the gram.

    Uses the same lowercased distinct word n-grams as the Jaccard
    machinery (``word_ngrams``): docs shorter than ``n`` tokens
    contribute their full text as one (short) gram rather than
    silently contributing nothing. EXCEPTION: empty/whitespace-only
    docs are excluded on BOTH sides — the short-doc fallback would
    otherwise make every blank doc's gram the empty string, and one
    blank eval doc would then flag every blank train doc as
    benchmark-contaminated.
    """
    from ._util import fan_out

    nonblank = F.trim(F.col(text_col)) != ""
    # the gram explode is the CPU-bound stage; a single-file train
    # scan would otherwise run it on one core (fan_out is a no-op
    # whenever the scan already yields >= parallelism splits)
    tg = fan_out(train.where(nonblank)).select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("_g")
    )
    eg = (
        eval_df.where(nonblank)
        .select(F.explode(word_ngrams(F.col(text_col), n)).alias("_g"))
        .distinct()
    )
    if broadcast_eval:
        eg = F.broadcast(eg)
    return (
        tg.join(eg, "_g")
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("_g")).alias("n_collisions"))
    )


def repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 20,
) -> DataFrame:
    """Verbatim repeated-span detection — the ExactSubstr-style dedup
    primitive (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): find every maximal character span that
    is covered by ``min_len``-char substrings occurring ≥ 2 times in
    the corpus (across documents OR repeated within one). Returns
    (id, span_start, span_end), 1-based inclusive char positions —
    the regions a pipeline masks, clips, or weighs down before
    training. Suffix-array ExactSubstr flags spans ≥ min_len that
    repeat verbatim; this shingle formulation flags exactly the
    positions covered by a repeated min_len-gram, which is the same
    span set for repeats of length ≥ 2·min_len−1 and a slightly
    conservative subset between min_len and that bound — the
    Spark-native trade for avoiding a distributed suffix array.

    Shape: explode each doc into its min_len-gram start positions,
    hash each gram to an engine-portable 60-bit int (first 15 hex
    chars of md5 — identical in DuckDB, so the oracle replays the
    exact span set; a 60-bit collision can only ADD a span, and both
    engines add the same one), ONE shuffle to count gram frequency,
    a semi-join back, then per-doc interval union as a window islands
    pass (merge overlapping or adjacent covers). Shuffle volume is
    ~|chars| skinny (id, pos, hash) rows — intrinsic to any
    shingle-join formulation; at 100 TB run it on the exact-deduped
    corpus and raise min_len to taste."""
    if min_len < 2:
        raise ValueError("min_len must be >= 2")
    from pyspark.sql import Window

    from ._util import fan_out

    k = min_len
    text = F.col(text_col)
    npos = F.length(text) - F.lit(k - 1)
    # sequence(1, 0) yields the DESCENDING [1, 0] (Spark's default
    # step is -1 when start > stop), which gave every shorter-than-k
    # doc a bogus span from two colliding out-of-range substrings
    # (r8 review, empirically confirmed) — docs too short to hold a
    # single k-gram must contribute NO positions
    positions = F.when(npos >= 1, F.sequence(F.lit(1), npos)).otherwise(
        F.array().cast("array<int>")
    )
    grams = fan_out(df).select(
        F.col(id_col).alias("_id"),
        F.explode(positions).alias("_p"),
        text.alias("_t"),
    ).select(
        "_id",
        "_p",
        F.conv(
            F.substring(F.md5(F.substring(F.col("_t"), F.col("_p"), k)), 1, 15),
            16,
            10,
        )
        .cast("long")
        .alias("_h"),
    )
    hot = grams.groupBy("_h").agg(F.count(F.lit(1)).alias("_c")).where(F.col("_c") >= 2)
    rep = grams.join(hot.select("_h"), "_h", "left_semi")
    w = (
        Window.partitionBy("_id")
        .orderBy("_p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # islands: a match starts a new span iff it begins past the
    # furthest end any earlier match reaches (+1 merges adjacency:
    # covers [p, p+k-1] and [p+k, ...] form one contiguous region)
    prev_end = F.max(F.col("_p") + F.lit(k - 1)).over(w)
    marked = rep.withColumn(
        "_new",
        F.when(prev_end.isNull() | (F.col("_p") > prev_end + 1), 1).otherwise(0),
    )
    w2 = (
        Window.partitionBy("_id")
        .orderBy("_p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    spans = (
        marked.withColumn("_g", F.sum("_new").over(w2))
        .groupBy("_id", "_g")
        .agg(
            F.min("_p").cast("int").alias("span_start"),
            (F.max("_p") + F.lit(k - 1)).cast("int").alias("span_end"),
        )
        .select(F.col("_id").alias(id_col), "span_start", "span_end")
    )
    return spans


def remove_repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 20,
    spans: DataFrame | None = None,
    output_col: str = "clean_text",
) -> DataFrame:
    """Rewrite each document with its verbatim repeated regions
    removed — the apply half of ``repeated_spans`` (pass a
    precomputed/filtered ``spans`` frame to clip by your own policy,
    e.g. only spans above some length). Adds ``output_col``; docs
    with no spans keep their text verbatim, a fully-covered doc
    becomes the empty string, and NULL text stays NULL.

    Shape: spans collapse to one sorted array per affected doc (spans
    per doc are few by construction — they are maximal and disjoint),
    broadcast-friendly join back, then the stitched rewrite is a
    single JVM higher-order ``aggregate`` over the span array: the
    accumulator walks (next-unwritten-position, builder) and appends
    the gap before each span, then the tail. No Python in the row
    path; one shuffle (the span groupBy) beyond repeated_spans
    itself."""
    if output_col in df.columns:
        raise ValueError(
            f"remove_repeated_spans: input already has column {output_col!r}"
        )
    if spans is None:
        spans = repeated_spans(df, id_col=id_col, text_col=text_col, min_len=min_len)
    sp = spans.groupBy(F.col(id_col).alias("_sid")).agg(
        F.sort_array(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("_sp")
    )
    text = F.col(text_col)
    stitched = F.aggregate(
        F.col("_sp"),
        F.struct(F.lit(1).alias("pos"), F.lit("").alias("s")),
        lambda acc, x: F.struct(
            (x["span_end"] + 1).alias("pos"),
            F.concat(
                acc["s"], text.substr(acc["pos"], x["span_start"] - acc["pos"])
            ).alias("s"),
        ),
        lambda acc: F.concat(
            acc["s"], text.substr(acc["pos"], F.length(text) - acc["pos"] + 1)
        ),
    )
    joined = df.join(sp, F.col(id_col) == F.col("_sid"), "left")
    return joined.withColumn(
        output_col, F.when(F.col("_sp").isNull(), text).otherwise(stitched)
    ).drop("_sid", "_sp")


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_words: int = 8,
    line_delim: str | None = None,
) -> DataFrame:
    """Corpus-level duplicate-LINE removal — the C4 recipe ("we
    discarded all but one of any three-sentence span occurring more
    than once in the data set") at a granularity finer than document
    dedup and coarser than ``repeated_spans``'s 20-gram islands: the
    boilerplate killer that strips repeated navigation, license
    headers, and template paragraphs while keeping each document's
    unique prose intact.

    A "line" is, by default, a fixed non-overlapping window of
    ``line_words`` whitespace tokens (empty split cells from leading /
    trailing / doubled whitespace are filtered out, so a duplicate
    line differing only by a trailing newline hashes identically);
    this corpus has no newline structure, so the fixed window stands
    in for sentences. On newline-structured corpora pass
    ``line_delim`` (a LITERAL delimiter, e.g. ``"\\n"``): the text is
    split on it, each piece is trimmed, empty pieces are dropped, and
    surviving lines are rejoined with the same delimiter. For every
    distinct normalized line, exactly ONE occurrence survives — the
    first in (id, line_idx) order, the same deterministic keep-first
    rule as ``exact_dedup`` — and every other occurrence corpus-wide
    is dropped. Documents are reassembled from their surviving lines
    in original order.

    Output: (id, clean_text, n_kept, n_dropped) — one row per input
    document with at least one line; a document whose every line was
    elsewhere-first comes back with clean_text '' and n_kept 0 so the
    caller decides its fate (C4 drops it; a provenance pipeline may
    want the tombstone).

    100 TB posture: the global decision shuffles ONLY skinny line
    metadata — (md5(line), id, line_idx), never line text (grouping by
    the 128-bit digest partitions lines exactly as grouping by the
    text would, collision odds ~n²/2¹²⁸). The keep-first winner per
    line is ``groupBy(digest).agg(min(struct(id, idx)))`` — NEVER a
    row_number window over the digest: the hot boilerplate line (a
    navigation bar in 10⁸ documents) is exactly the skewed key this
    operator exists to find, and a window sort would funnel every
    occurrence of it into one straggler task with no AQE rescue
    (skew splitting applies to joins and aggregates, not window
    sorts), while partial aggregation collapses the hot key to one
    row per map task before the shuffle. No per-occurrence join-back
    is needed either: a document's kept indices ARE the winner rows
    regrouped by winning id (one skinny |distinct lines| → |docs|
    aggregate, skew-free — a doc wins at most its own line count),
    and n_dropped falls out as size(lines) − n_kept. The only
    full-text movement is the final id-keyed rebuild join that every
    per-doc rewrite here pays (``remove_repeated_spans`` has the same
    shape). Reassembly is a pure JVM index-filter over the per-doc
    line array — no Python, no explode of text.
    """
    if line_words <= 0:
        raise ValueError(f"need line_words > 0, got {line_words}")

    from ._util import fan_out

    text = F.col(text_col)
    if line_delim is not None:
        import re as _re

        lines_expr = F.filter(
            F.transform(
                F.split(text, _re.escape(line_delim), -1), lambda x: F.trim(x)
            ),
            lambda x: x != "",
        )
        join_sep = line_delim
    else:
        toks = F.filter(F.split(F.trim(text), WS), lambda x: x != "")
        n = F.size(toks)
        # sequence(0, -1, step) raises; an all-whitespace doc (zero
        # real tokens) must yield an empty line array instead, to be
        # dropped by the size(_lines) > 0 gate below
        starts = F.when(
            n > 0, F.sequence(F.lit(0), n - 1, F.lit(line_words))
        ).otherwise(F.array().cast("array<int>"))
        lines_expr = F.transform(
            starts, lambda s: F.array_join(F.slice(toks, s + 1, line_words), " ")
        )
        join_sep = " "
    # a single-file scan would run the whole tokenize+digest pass on
    # one core (measured at the 100× stress: 141 s wall with a 140 s
    # max task before this rebalance). The blank-doc gate must be a
    # CHEAP exact predicate applied BEFORE the fan-out: a
    # size(_lines) > 0 gate after it gets pushed down into the scan
    # as a filter that recomputes the whole tokenize+slice pipeline
    # on the scan's (possibly single) split — measured 176 s
    # single-task scan at the 100× stress. rlike '\\S' (any
    # non-whitespace char) is exactly equivalent to "≥ 1 line" in
    # BOTH modes (unlike trim(text) != '', whose 0x20-only trim
    # keeps '\n'-only docs) and costs one linear scan.
    nonempty = fan_out(df.where(text.rlike(r"\S"))).select(
        F.col(id_col), lines_expr.alias("_lines")
    )
    # posexplode the per-line digest array: pos IS line_idx, and the
    # Generate's input is 16-byte hashes — text never rides the explode
    meta = nonempty.select(
        F.col(id_col),
        F.posexplode(F.transform("_lines", F.md5)).alias("_line_idx", "_key"),
    )
    # keep-first winner per distinct line: a partial-aggregating
    # min(struct) — the map side collapses a million-occurrence
    # boilerplate line to one candidate per task, so no single
    # reducer ever sees the hot key's full weight
    winners = meta.groupBy("_key").agg(
        F.min(
            F.struct(
                F.col(id_col).alias("i"), F.col("_line_idx").alias("x")
            )
        ).alias("_w")
    )
    # a doc's kept indices are the winner rows regrouped by winning
    # id — no per-occurrence join-back; a doc wins at most its own
    # line count, so this aggregate cannot skew
    kept = winners.groupBy(F.col("_w.i").alias(id_col)).agg(
        F.sort_array(F.collect_list("_w.x")).alias("_kept_idxs"),
        F.count(F.lit(1)).cast("int").alias("n_kept"),
    )
    rebuilt = F.array_join(
        F.filter(
            F.col("_lines"),
            lambda _x, i: F.array_contains(F.col("_kept_idxs"), i),
        ),
        join_sep,
    )
    # LEFT join: a doc whose every line was elsewhere-first has no
    # winner row — it must still come back as a '' / n_kept 0
    # tombstone, with n_dropped = its full line count
    n_kept = F.coalesce(F.col("n_kept"), F.lit(0))
    return (
        nonempty.join(kept, id_col, "left")
        .select(
            id_col,
            F.when(F.col("_kept_idxs").isNull(), F.lit(""))
            .otherwise(rebuilt)
            .alias("clean_text"),
            n_kept.cast("int").alias("n_kept"),
            (F.size("_lines") - n_kept).cast("int").alias("n_dropped"),
        )
    )


__all__ = [
    "banded_signatures",
    "contamination",
    "line_dedup",
    "remove_repeated_spans",
    "repeated_spans",
    "cross_near_dup_pairs",
    "gram_array",
    "exact_dedup",
    "char_shingles",
    "word_ngrams",
    "minhash_signature",
    "minhash_signatures_df",
    "lsh_candidate_pairs",
    "ngram_jaccard",
    "jaccard_near_dup_pairs",
    "near_dup_pairs",
    "simhash",
    "simhash_near_dup_pairs",
    "dedup_clusters",
]
