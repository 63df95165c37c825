"""Model-based quality scoring: character-bigram language model.

The heavier cousin of the heuristic quality_score — the standard
"perplexity filter" shape from training-data pipelines (score each
document by how probable its character stream is under a small LM
fitted on the corpus itself, or on a trusted reference corpus), kept
fully distributed:

fit:   explode char bigrams → two hash aggregates (bigram counts,
       prefix counts) — map-side partials, shuffle is vocab-sized
       (≤ |charset|² rows), NOT corpus-sized.
score: explode doc bigrams → broadcast-join the (tiny) count tables →
       per-doc mean log P(c2|c1) with add-one smoothing.

Everything is DataFrame algebra; no Python in the row path. The fit
output is a plain DataFrame you can persist/write and reuse, so at
100 TB you fit once on a sample (`deterministic_sample`) and score
the full corpus with one broadcast join pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _char_bigrams(text: Column) -> Column:
    # split once + zip adjacent — O(n) per doc. (substr(i, 2) per
    # position is O(i) on UTF8 strings → O(n²) per doc, measured 2x
    # slower end-to-end.) split('') yields CODE POINTS (Java regex
    # never splits a surrogate pair), so non-BMP text bigrams match a
    # codepoint-based SQL substr exactly — verified with emoji.
    chars = F.split(text, "")
    n = F.greatest(F.size(chars) - 1, F.lit(1))
    return F.zip_with(
        F.slice(chars, 1, n), F.slice(chars, 2, n), lambda a, b: F.concat(a, b)
    )


def fit_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Fit bigram log-probabilities with add-one smoothing. Returns
    (bigram, logp) — vocabulary-sized, broadcastable.

    ``logp`` is rounded to a FIXED scale (6 decimals) at fit time:
    downstream per-document aggregates can then sum it as an exact
    decimal, making scores independent of partial-aggregation order —
    the same float-determinism discipline as the engine's decimal-sum
    relational aggregates. 1e-6 quantization of a log-prob is far
    below any quality-gate resolution."""
    from ._util import fan_out

    grams = fan_out(df).select(
        F.explode(_char_bigrams(F.lower(F.col(text_col)))).alias("bigram")
    ).where(F.length("bigram") == 2)
    # ONE corpus pass: bigram counts are vocabulary-sized, so
    # materialize them to a local table instead of persist() — no
    # cache entry to leak, and the fit never recomputes the corpus
    # scan (the LM is reused via broadcast in score_bigram_lm)
    spark = df.sparkSession
    bi_local = grams.groupBy("bigram").agg(F.count(F.lit(1)).alias("n_bi")).toPandas()
    bi = spark.createDataFrame(bi_local, schema="bigram string, n_bi long")
    uni = (
        bi.groupBy(F.substring("bigram", 1, 1).alias("prefix"))
        .agg(F.sum("n_bi").alias("n_uni"))
    )
    vocab = uni.count() + 1  # smoothing denominator (reads the local table)
    return (
        bi.withColumn("prefix", F.substring("bigram", 1, 1))
        .join(uni, "prefix")
        .select(
            "bigram",
            # floor-based 6-decimal quantizer, NOT round(·, 6): the
            # same cross-engine round-tie divergence quantize4's
            # docstring records for 4 decimals applies here, and this
            # value feeds an exact-hash oracle gate (r7 review; the
            # oracle SQL mirrors this floor form)
            (
                F.floor(
                    F.log((F.col("n_bi") + 1) / (F.col("n_uni") + F.lit(vocab)))
                    * F.lit(1_000_000.0)
                    + F.lit(0.5)
                )
                / F.lit(1_000_000.0)
            ).alias("logp"),
        )
    )


def score_bigram_lm(
    df: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    floor_logp: float = -12.0,
) -> DataFrame:
    """Per-document mean log-probability under the fitted LM (higher =
    more typical text; gibberish and wrong-charset docs score low).
    Unseen bigrams take ``floor_logp``. One explode + one BROADCAST
    join + one aggregate — corpus scanned once. Documents too short to
    have a bigram (< 2 chars) still appear in the output with
    n_bigrams = 0 and NULL lm_logp — scores never silently drop rows.

    The mean is EXACT: per-doc log-probs (fixed 6-decimal scale from
    the fit) are summed as decimal(28,6) — associative, partial-agg-
    order-independent — and divided by the count once, at the end. The
    same score comes out of any engine that follows the definition,
    which is what lets the declared query hold this operator to a
    hash-checked SQL oracle."""
    from ._util import fan_out

    grams = fan_out(df).select(
        F.col(id_col),
        F.explode(_char_bigrams(F.lower(F.col(text_col)))).alias("bigram"),
    ).where(F.length("bigram") == 2)
    scored = grams.join(F.broadcast(lm), "bigram", "left").select(
        id_col, F.coalesce(F.col("logp"), F.lit(floor_logp)).alias("logp")
    )
    agg = scored.groupBy(id_col).agg(
        (
            F.sum(F.col("logp").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("lm_logp"),
        F.count(F.lit(1)).alias("n_bigrams"),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .withColumn("n_bigrams", F.coalesce(F.col("n_bigrams"), F.lit(0)))
    )


def lm_quality_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fit_on: DataFrame | None = None,
) -> DataFrame:
    """Convenience: fit on ``fit_on`` (default: the corpus itself) and
    score every document. At scale pass a deterministic_sample as
    fit_on."""
    lm = fit_bigram_lm(fit_on if fit_on is not None else df, text_col=text_col)
    return score_bigram_lm(df, lm, id_col=id_col, text_col=text_col)


def perplexity_buckets(
    df: DataFrame,
    buckets: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    fit_on: DataFrame | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """CCNet-style per-language quality buckets (Wenzek et al. 2020):
    score every document under the bigram LM, then split each
    language's documents into ``buckets`` equal quality tiers by score
    rank — bucket 1 is the head (highest mean log-prob / lowest
    perplexity), bucket ``buckets`` the tail. The head/middle/tail
    labels are what the published recipe samples from (keep head+
    middle, downweight tail). Output: (id, lang, lm_logp, n_bigrams,
    ppl_bucket); documents too short to score (< 2 chars) keep NULL
    lm_logp AND NULL ppl_bucket — never silently dropped.

    Bucket assignment is EXACTLY SQL's
    ``ntile(b) OVER (PARTITION BY lang ORDER BY lm_logp DESC, id)``
    — the first (n mod b) tiers take the extra row — but it is NOT
    computed as that window: a per-language ntile sorts each entire
    language in ONE task (English = half a 100 TB corpus through a
    single straggler — the same skewed-key window line_dedup's
    keep-first was rewritten to avoid; AQE cannot split window
    sorts). Instead the rank machine is distributed exactly:

      1. range-partition the scored rows by (lang, lm_logp DESC, id)
         into an EXPLICIT ``num_partitions`` (user-numbered, so AQE
         cannot coalesce it away — DIVERGENCES #21); every partition
         holds a contiguous slice of the global order,
      2. per-(partition, lang) counts — a tiny ≤ parts × langs frame
         — prefix-summed into rank offsets and language totals, both
         broadcast back,
      3. per-partition local row_number (a window keyed by
         (partition, lang), each key bounded by the range split size
         regardless of language skew) + offset = exact global rank,
      4. the closed-form ntile rule maps (rank, n) to the tier.

    The same two-phase shape as ``budget_cap``'s global cumsum, but
    producing order statistics instead of running sums. At 100 TB
    the only corpus-wide exchange is the one range shuffle of skinny
    (id, lang, score) rows; fit on a sample via ``fit_on``."""
    if buckets <= 0:
        raise ValueError(f"need buckets > 0, got {buckets}")
    from pyspark.sql import Window

    from ._caches import track

    scores = lm_quality_scores(df, id_col=id_col, text_col=text_col, fit_on=fit_on)
    base = track(
        df.select(id_col, lang_col).join(scores, id_col).persist()
    )  # two consumers: the ranked path and the NULL-score passthrough
    scored = base.where(F.col("lm_logp").isNotNull())
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    part = track(
        scored.repartitionByRange(
            n_parts, F.col(lang_col), F.col("lm_logp").desc(), F.col(id_col)
        )
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )  # persisted: counts + rank both consume it, and re-evaluating a
    #    sampled range exchange under a nondeterministic _pid column
    #    must never happen twice with different boundaries
    counts = part.groupBy("_pid", lang_col).agg(F.count(F.lit(1)).alias("_c"))
    w_off = (
        Window.partitionBy(lang_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_pid",
        lang_col,
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
    )
    totals = counts.groupBy(lang_col).agg(F.sum("_c").alias("_n"))
    w_local = Window.partitionBy("_pid", lang_col).orderBy(
        F.col("lm_logp").desc(), F.col(id_col)
    )
    ranked = (
        part.select(id_col, lang_col, "lm_logp", "n_bigrams", "_pid")
        .withColumn("_r", F.row_number().over(w_local))
        .join(F.broadcast(offsets), ["_pid", lang_col])
        .join(F.broadcast(totals), lang_col)
        .withColumn("_rank", F.col("_off") + F.col("_r"))
    )
    # closed-form ntile(b): q = n div b rows per tier, the first
    # r = n mod b tiers take one extra. Both divisions are guarded
    # (q+1 ≥ 1 always; the q divisor only reaches rows with rank past
    # the (q+1)-sized tiers, which exist only when q ≥ 1 — greatest()
    # keeps the dead branch from tripping ANSI divide-by-zero)
    n = F.col("_n")
    b = F.lit(buckets).cast("long")
    q = F.floor(n / b)
    r = n % b
    g = F.col("_rank") - 1
    bucket = F.when(
        F.col("_rank") <= (q + 1) * r, F.floor(g / (q + 1)) + 1
    ).otherwise(r + F.floor((g - (q + 1) * r) / F.greatest(q, F.lit(1))) + 1)
    out = ranked.select(
        id_col, lang_col, "lm_logp", "n_bigrams", bucket.alias("ppl_bucket")
    )
    unscored = base.where(F.col("lm_logp").isNull()).select(
        id_col,
        lang_col,
        "lm_logp",
        "n_bigrams",
        F.lit(None).cast("long").alias("ppl_bucket"),
    )
    return out.unionByName(unscored)


__all__ = [
    "fit_bigram_lm",
    "score_bigram_lm",
    "lm_quality_scores",
    "perplexity_buckets",
]
