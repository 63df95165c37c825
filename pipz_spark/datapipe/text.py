"""Text analysis over document tables — pure Column expressions.

Every operator here is a Step producing deterministic, DuckDB-
reproducible outputs (the driver's oracle hash-matches them), built
exclusively from JVM-side functions: split/regexp/length/md5 and
higher-order array functions. No Python in the row path — at 100 TB
these run inside whole-stage codegen over the parquet scan with the
text column pruned in.
"""

from __future__ import annotations

from collections.abc import Sequence as Seq

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..core.step import Step
from ..operators.processors import transform

# Small deterministic stopword lists per language for the n-gram/
# stopword language heuristic. Order matters for tie-breaks.
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"),
    "es": ("el", "los", "las", "y", "es", "un", "una", "en", "que", "por"),
}


# The ONE whitespace class, written out explicitly: Java's \s also
# matches vertical tab (\x0B) while DuckDB's RE2 \s does not, so a
# VT-bearing document would tokenize differently on the two engines
# (r7 review finding). The explicit set below is identical in both
# regex dialects, and every oracle's \s+ equals it under RE2.
WS = r"[ \t\n\f\r]+"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the portable baseline tokenizer).

    NOTE the split-cell semantic: ``trim`` strips only 0x20, so text
    wrapped in other whitespace (trailing ``\\n``, leading ``\\t``)
    yields empty-string cells. The long-standing stat operators
    (``text_stats``/``quality_score``/``lang_id``) count these cells —
    that is their pinned, driver-green oracle contract — while
    operators that reason about WORDS (``gopher_quality``) filter
    empties explicitly. New word-semantics operators should filter;
    changing this helper would silently shift every pinned oracle."""
    return F.split(F.trim(text), WS)


def stopword_hits(text: Column, lang: str) -> Column:
    """Count of ``lang`` stopwords among the lowercased whitespace
    tokens — the ONE definition text_stats and quality_score share
    (three drifting inline copies before r7; lang_id keeps its own
    multi-language variant by design)."""
    return F.size(F.filter(tokens(F.lower(text)), lambda t: t.isin(*STOPWORDS[lang])))


def token_count(name: str = "token-count", text_col: str = "text") -> Step:
    """Whitespace + BPE-ish token counting.

    ``n_tokens``  — whitespace tokens
    ``n_bpe_ish`` — sub-word-ish proxy: ceil(chars/4) per whitespace
                    token summed (the common ~4-chars-per-BPE-token
                    heuristic), computed exactly so the oracle matches.
    """
    text = F.col(text_col)

    def n_bpe(toks: Column) -> Column:
        return F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.ceil(F.length(t) / F.lit(4.0)).cast("long"),
        )

    return transform(
        name,
        lambda df: {
            "n_tokens": F.size(tokens(text)).cast("long"),
            "n_bpe_ish": n_bpe(tokens(text)),
        },
    )


def quantize4(x: Column) -> Column:
    """Quantize a double to 4 decimals as floor(x·10⁴ + 0.5)/10⁴ —
    NOT round(x, 4): engines disagree on round's tie handling for
    doubles (Spark HALF_UP on the binary value, DuckDB on the
    shortest decimal rendering — a real 2-in-5000-row divergence at
    sf0.1), while floor of the identical IEEE double is
    bit-deterministic everywhere. Every oracle-gated 4-decimal ratio
    in this module goes through this ONE helper; the oracle SQL
    mirrors it as floor(x * 10000.0 + 0.5) / 10000.0."""
    return F.floor(x * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def text_stats(name: str = "text-stats", text_col: str = "text") -> Step:
    """Deterministic per-document statistics used by quality scoring."""
    text = F.col(text_col)
    toks = tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[^.,!?;:]", ""))
    upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    en_stops = stopword_hits(text, "en")
    return transform(
        name,
        {
            "n_tokens": n_tok.cast("long"),
            "avg_token_len": quantize4(
                F.length(F.regexp_replace(text, WS, "")) / n_tok
            ),
            "punct_ratio": quantize4(punct / n_chars),
            "upper_ratio": quantize4(upper / n_chars),
            "stopword_ratio": quantize4(en_stops / n_tok),
        },
    )


def quality_score(name: str = "quality-score", text_col: str = "text") -> Step:
    """Composite quality score in [0, 1] from length/punct/stopword
    signals — the standard cheap pre-filter before expensive dedup in
    a training-data pipeline. Fully expression-based and oracle-
    reproducible (weights are fixed, output rounded)."""
    text = F.col(text_col)
    toks = tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    stop_ratio = stopword_hits(text, "en") / n_tok
    punct_ratio = F.length(F.regexp_replace(text, r"[^.,!?;:]", "")) / n_chars
    len_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    score = (
        F.lit(0.5) * len_score
        + F.lit(0.4) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.1) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
    )
    return transform(name, {"quality": quantize4(score)})


def lang_id(name: str = "lang-id", text_col: str = "text") -> Step:
    """Stopword-count language heuristic (deterministic argmax with
    fixed tie-break order en > de > fr > es; 'und' = undetermined when
    nothing matches)."""
    low = tokens(F.lower(F.col(text_col)))

    def counter(ws: tuple[str, ...]):
        # single-arg lambda (PySpark dispatches on lambda arity)
        return lambda t: t.isin(*ws)

    hits = {lang: F.size(F.filter(low, counter(ws))) for lang, ws in STOPWORDS.items()}
    en, de, fr, es = hits["en"], hits["de"], hits["fr"], hits["es"]
    best = F.greatest(en, de, fr, es)
    pred = (
        F.when(best <= 0, F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(de == best, F.lit("de"))
        .when(fr == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return transform(name, {"lang_pred": pred})


def regex_token_count(name: str = "regex-tokens", text_col: str = "text") -> Step:
    """BPE-ish regex tokenization (portable subset of the GPT-2
    pattern — RE2 has no lookahead, so the classes are letters runs /
    digit runs / other-symbol runs): counts per class + total. All
    via regexp_extract_all, JVM-side."""
    text = F.col(text_col)
    words = F.regexp_extract_all(text, F.lit(r"\p{L}+"), 0)
    numbers = F.regexp_extract_all(text, F.lit(r"\p{N}+"), 0)
    # explicit whitespace chars instead of \s inside the class: Java
    # \s includes VT, RE2's does not (see WS above) — a VT would count
    # as a symbol only on the oracle side
    symbols = F.regexp_extract_all(text, F.lit(r"[^ \t\n\f\r\p{L}\p{N}]+"), 0)
    return transform(
        name,
        {
            "n_word_tokens": F.size(words).cast("long"),
            "n_number_tokens": F.size(numbers).cast("long"),
            "n_symbol_tokens": F.size(symbols).cast("long"),
            "n_regex_tokens": (F.size(words) + F.size(numbers) + F.size(symbols)).cast("long"),
        },
    )


def fingerprint(name: str = "fingerprint", text_col: str = "text") -> Step:
    """Document fingerprints:

    ``fp_md5``  — md5 of whitespace-normalized lowercase text (the
                  exact-dedup key).
    ``fp_roll`` — 31-base rolling hash of the character stream modulo
                  1e9+7 (a cheap locality-free content hash; the mod
                  keeps every intermediate in BIGINT range so the same
                  fold is expressible in ANSI SQL).
    """
    text = F.col(text_col)
    norm = F.regexp_replace(F.lower(text), WS, " ")
    roll = F.aggregate(
        F.transform(F.split(text, ""), lambda c: F.ascii(c)),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % F.lit(1000000007).cast("long"),
    )
    return transform(name, {"fp_md5": F.md5(norm), "fp_roll": roll})


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding-window document chunking — the shape every training
    pipeline needs between raw documents and a context-window-bounded
    model: overlapping token windows of ``size`` tokens every
    ``stride`` tokens (overlap = size - stride).

    Output: one row per chunk — (id, chunk_id, chunk, n_chunk_tokens).
    A trailing window that would add NO new tokens (it is fully
    contained in the previous window, which happens when the doc ends
    inside the overlap region) is dropped; a document shorter than one
    window yields exactly one chunk. Empty/whitespace-only documents
    yield none.

    100 TB posture: pure JVM expressions (split → filtered sequence →
    explode → slice → array_join), no shuffle, no Python; output rows
    per doc are ~n_tokens/stride, a bounded, chosen expansion — the
    same arithmetic-explode pattern as multimodal frame sampling
    (multimodal.py), on text.
    """
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError(f"need 0 < stride <= size, got size={size} stride={stride}")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # starts 0, stride, 2*stride … < n; keep a start only if its
    # window adds tokens past the previous window's end (start-stride
    # + size), i.e. start + size - stride < n — except start 0, which
    # always stands
    starts = F.filter(
        F.sequence(F.lit(0), n - 1, F.lit(stride)),
        lambda s: (s == 0) | (s + F.lit(size - stride) < n),
    )
    exploded = (
        df.where(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), toks.alias("_toks"), F.explode(starts).alias("_s"))
    )
    return exploded.select(
        id_col,
        (F.col("_s") / F.lit(stride)).cast("long").alias("chunk_id"),
        F.array_join(F.slice("_toks", F.col("_s") + 1, size), " ").alias("chunk"),
        F.least(F.lit(size), F.size("_toks") - F.col("_s")).cast("long").alias(
            "n_chunk_tokens"
        ),
    )


# conservative RE2-and-Java-compatible patterns (no lookaround, no
# backreferences): the intersection that runs identically JVM-side,
# in DuckDB (oracle), and in most downstream scrubbers
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def redact_pii(
    name: str = "redact-pii",
    text_col: str = "text",
    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
) -> Step:
    """Scrub PII-shaped spans (emails, NANP phone numbers, IPv4
    addresses) from a text column — the compliance pass a
    training-data pipeline runs before anything ships to a trainer.
    Chained JVM-side regexp_replace, one pass per pattern; order
    matters (email first: an email can contain digits that the
    looser patterns would mangle mid-token)."""
    col = F.col(text_col)
    for pat, repl in patterns:
        col = F.regexp_replace(col, pat, repl)
    return transform(name, {text_col: col})


def ngram_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Repetition-based quality signals — the standard filter class
    for machine-generated/boilerplate text: how much of a document is
    repeated n-grams.

    Output per doc: ``n_grams`` (total n-gram occurrences,
    NON-distinct), ``rep_fraction`` (fraction of occurrences whose
    gram appears more than once in the doc), ``top_fraction``
    (occurrence share of the single most repeated gram).

    Deliberately a two-level AGGREGATION, not a per-row expression: a
    per-row `transform(grams, g -> count of g in grams)` is O(tokens²)
    per document — fatal on million-token documents — while
    count-per-(doc, gram) + per-doc ratios is linear, and the first
    groupBy's map-side partial aggregation collapses each doc's
    repeats before the (skinny) shuffle. Docs shorter than ``n``
    tokens count their whole text as one gram (consistent with
    word_ngrams); empty docs are excluded.
    """
    from .dedup import gram_array

    grams = gram_array(F.col(text_col), n)
    from ._util import fan_out

    # the gram explode + partial agg is the CPU-bound stage; a
    # single-file scan would serialize it on one core (fan_out is a
    # no-op whenever the scan already yields >= parallelism splits)
    per_gram = (
        fan_out(df.where(F.trim(F.col(text_col)) != ""))
        .select(F.col(id_col), F.explode(grams).alias("_g"))
        .groupBy(id_col, "_g")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    total = F.sum("_cnt")
    # quantize4, not round(·, 4): these are exactly the small-integer
    # count ratios whose 5th decimal can render as a tie, where
    # Spark's and DuckDB's round disagree (see quantize4's docstring)
    return per_gram.groupBy(id_col).agg(
        total.cast("long").alias("n_grams"),
        quantize4(
            F.sum(F.when(F.col("_cnt") > 1, F.col("_cnt")).otherwise(0)) / total
        ).alias("rep_fraction"),
        quantize4(F.max("_cnt") / total).alias("top_fraction"),
    )


def pack_sequences(
    chunks: DataFrame,
    budget: int,
    id_cols: tuple[str, str] = ("doc_id", "chunk_id"),
    tokens_col: str = "n_chunk_tokens",
    shards: int = 32,
) -> DataFrame:
    """Assign chunks to fixed-capacity training packs — the
    concat-and-chop packing LLM dataloaders run between chunking and
    batching: conceptually concatenate every chunk's tokens in a
    deterministic order and cut at each ``budget`` boundary; a chunk
    belongs to the pack its FIRST token lands in (a boundary-straddling
    chunk is the dataloader's split-or-pad decision, not this
    operator's — ``pack_offset`` gives it the cut position).

    Greedy open-a-new-pack-on-overflow packing is a non-associative
    scan — not expressible as a window aggregate, and inherently
    sequential. Concat-and-chop IS a window cumsum, which is why real
    loaders use it and why it scales: chunks shard deterministically
    by md5 of the doc id (full 32-bit hash range, the same derivation
    as ``deterministic_shuffle`` — engine-reproducible and uncapped,
    so ``shards`` can genuinely reach cluster-core counts), and the
    only state is
    ONE running sum per shard — a window over (shard ORDER BY doc,
    chunk), never a global order. Each shard is ONE window task, so
    ``shards`` bounds the stage's parallelism AND its per-task data:
    size it to at least the cluster's core count (thousands at real
    scale — the default 32 suits local runs).

    Output: input columns + ``shard``, ``pack_id`` (within shard),
    ``pack_offset`` (token offset of the chunk's first token within
    its pack).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    from pyspark.sql import Window

    doc_col, chunk_col = id_cols
    # full-32-bit md5 bits mod shards (hex chars 9-16, the same
    # derivation as sampling.deterministic_shuffle) — hash_bucket's
    # [0, 10000) range silently capped effective shards at 10000 and
    # skewed sizes whenever shards didn't divide 10000 (r7 review)
    key_str = F.coalesce(F.col(doc_col).cast("string"), F.lit("__pipz_null__"))
    h = F.md5(F.concat(key_str, F.lit("pack")))
    shard = (F.conv(F.substring(h, 9, 8), 16, 10).cast("long") % shards).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(doc_col, chunk_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("long")
    return (
        chunks.withColumn("shard", shard)
        .withColumn("pack_id", F.floor(start / F.lit(budget)).cast("long"))
        .withColumn("pack_offset", (start % F.lit(budget)).cast("long"))
    )


def pack_ffd(
    chunks: DataFrame,
    budget: int,
    id_cols: tuple[str, str] = ("doc_id", "chunk_id"),
    tokens_col: str = "n_chunk_tokens",
    shards: int = 32,
) -> DataFrame:
    """NO-CROSSING pack assignment — the T5-style packing discipline
    (Raffel et al. 2020 pack sequences without letting an example
    straddle two packs): every chunk lands whole in exactly one pack
    of capacity ``budget``, via first-fit-decreasing bin packing.
    The complement of ``pack_sequences`` (concat-and-chop, which cuts
    at every boundary): chop maximizes fill but splits chunks; FFD
    never splits and wastes ≤ the FFD bound (11/9·OPT + 6/9 bins).

    Greedy bin packing is inherently sequential (``pack_sequences``'
    docstring explains why no window aggregate can express it), so
    the distributed form is the packing literature's standard shard
    decomposition: chunks shard deterministically by md5 of the doc
    id (the ``pack_sequences`` derivation — engine-reproducible,
    shards can reach cluster-core counts), and each shard runs an
    EXACT in-memory FFD inside one Arrow-batched ``applyInPandas``
    task. Shard-local FFD costs at most one partially-filled bin per
    shard versus global FFD; ``shards`` bounds both the stage's
    parallelism and each task's memory. Only the SKINNY columns
    (shard, ids, token count) cross the Arrow boundary: the frame is
    projected before ``applyInPandas`` and ``pack_id`` joins back on
    the id columns, so a caller may pass the full frame — text or
    embedding columns never enter the packer task or its groupBy
    shuffle. (At 100 TB the wide frame shuffles once for the
    join-back; shipping it INTO the packer would shuffle it into the
    groupBy and move it through Arrow twice.)

    A NULL token count fails fast with a clear error (a NULL chunk
    length is an upstream tokenization bug; packing it as 0 would
    silently overfill packs). ``shards`` must be positive — Spark's
    non-ANSI ``%`` maps a zero divisor to NULL, which would silently
    collapse every row into one NULL shard.

    A chunk larger than ``budget`` gets a pack of its own (splitting
    or truncating is the dataloader's call, flagged by its fill
    exceeding the budget). Deterministic: within a shard, chunks are
    packed in (tokens DESC, doc, chunk) order, first-fit into the
    lowest-numbered pack with room.

    Output: input columns + ``shard``, ``pack_id`` (within shard).
    ``id_cols`` must uniquely identify a chunk (they key the
    join-back; a duplicate pair would fan out).
    Behavioral operator (like ``bpe_train``): greedy packing has no
    SQL shape, so the gate is the pytest invariants (exact
    pure-Python FFD replay, capacity, partition invariance), not a
    DuckDB oracle.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if shards <= 0:
        raise ValueError(f"shards must be positive, got {shards}")
    import pandas as pd

    doc_col, chunk_col = id_cols
    key_str = F.coalesce(F.col(doc_col).cast("string"), F.lit("__pipz_null__"))
    h = F.md5(F.concat(key_str, F.lit("pack")))
    shard = (F.conv(F.substring(h, 9, 8), 16, 10).cast("long") % shards).cast("int")
    sharded = chunks.withColumn("shard", shard)
    # only (shard, ids, count) enter the packer; everything else
    # waits on the join-back side of the Arrow boundary
    skinny = sharded.select("shard", doc_col, chunk_col, tokens_col)
    # fresh StructType — StructType.add MUTATES in place, and
    # DataFrame.schema returns the frame's cached instance, so
    # skinny.schema.add(...) would corrupt skinny's own column list
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        list(skinny.schema.fields) + [StructField("pack_id", LongType())]
    )

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf[tokens_col].isna().any():
            bad = pdf.loc[pdf[tokens_col].isna(), [doc_col, chunk_col]].iloc[0]
            raise ValueError(
                f"pack_ffd: NULL {tokens_col} at "
                f"({doc_col}={bad[doc_col]!r}, {chunk_col}={bad[chunk_col]!r}) "
                "— token counts must be non-NULL (upstream tokenization bug)"
            )
        order = pdf.sort_values(
            [tokens_col, doc_col, chunk_col], ascending=[False, True, True]
        ).index
        fills: list[int] = []
        pack_ids = pd.Series(0, index=pdf.index, dtype="int64")
        for i in order:
            t = int(pdf.at[i, tokens_col])
            for j, fill in enumerate(fills):
                if fill + t <= budget:
                    fills[j] = fill + t
                    pack_ids.at[i] = j
                    break
            else:
                pack_ids.at[i] = len(fills)
                fills.append(t)
        return pdf.assign(pack_id=pack_ids)

    packed = skinny.groupBy("shard").applyInPandas(ffd, schema)
    # null-safe equi-join: the shard hash deliberately admits NULL
    # doc ids (coalesced key above), so the join-back must too
    assignments = packed.select(
        F.col(doc_col).alias("_ffd_doc"),
        F.col(chunk_col).alias("_ffd_chunk"),
        "shard",
        "pack_id",
    )
    cond = F.col(doc_col).eqNullSafe(F.col("_ffd_doc")) & F.col(
        chunk_col
    ).eqNullSafe(F.col("_ffd_chunk"))
    return chunks.join(assignments, cond, "inner").drop("_ffd_doc", "_ffd_chunk")


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_ratio: float = 0.80,
    min_stopword_hits: int = 2,
    max_symbol_ratio: float = 0.10,
) -> DataFrame:
    """Gopher-rule document quality report (Rae et al. 2021, "Scaling
    Language Models", table A1 — the doc-level subset: word-count
    band, mean word length band, alphabetic-word ratio, stopword
    presence, symbol-to-word ratio; the line-structure rules need
    line boundaries this corpus lacks). One row per INPUT document —
    a filter report must cover its universe, so blank/NULL text gets
    n_words 0, NULL metrics, keep false, rather than vanishing.

    Output: (id, n_words, mean_word_len, alpha_ratio, symbol_ratio,
    stopword_hits, keep). Ratios are quantize4-floored doubles and
    every metric is a pure whitespace-token expression, so the DuckDB
    oracle reproduces each value bit-for-bit; ``keep`` is the AND of
    the five rules with NULL collapsing to false.

    Scale shape: one projection over the scan — no join, no shuffle
    beyond ``fan_out``'s under-partitioned-scan guard (a multi-pass
    token projection on a single-split scan ran 3-wide at the 100×
    stress: 94 s, vs seconds once rebalanced; on a real many-split
    corpus the guard is a no-op and the plan is pure codegen over the
    scan)."""
    from ._util import fan_out

    df = fan_out(df)
    text = F.coalesce(F.col(text_col), F.lit(""))
    # filter empty tokens rather than trusting trim: trim strips only
    # 0x20, so a doc ending in '\n' or '\t' would otherwise grow
    # phantom '' words that corrupt EVERY rule (a 49-word doc with a
    # trailing newline passes the 50-word floor; 'hello world\n'
    # scores alpha 0.67 and gets rejected) — and a whitespace-only
    # doc is blank by word count, not by trim
    toks = F.filter(tokens(text), lambda x: x != "")
    n_words = F.size(toks)
    blank = n_words == 0
    nw_d = n_words.cast("double")

    def metric(x: Column) -> Column:
        return F.when(blank, F.lit(None).cast("double")).otherwise(quantize4(x))

    chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )
    mean_wl = metric(chars.cast("double") / nw_d)
    alpha = metric(
        F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]"))).cast("double") / nw_d
    )
    sym = metric(
        F.size(
            F.filter(toks, lambda x: x.contains("#") | x.contains("..."))
        ).cast("double")
        / nw_d
    )
    stops = F.when(blank, F.lit(None).cast("int")).otherwise(
        stopword_hits(text, "en")
    )
    keep = F.coalesce(
        n_words.between(min_words, max_words)
        & mean_wl.between(min_mean_word_len, max_mean_word_len)
        & (alpha >= F.lit(min_alpha_ratio))
        & (stops >= F.lit(min_stopword_hits))
        & (sym <= F.lit(max_symbol_ratio)),
        F.lit(False),
    )
    return df.select(
        F.col(id_col),
        n_words.cast("int").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        alpha.alias("alpha_ratio"),
        sym.alias("symbol_ratio"),
        stops.alias("stopword_hits"),
        keep.alias("keep"),
    )


def top_ngrams(
    df: DataFrame,
    n: int = 3,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary report: the ``k`` word ``n``-grams present in
    the most documents — (rank, gram, df), rank 1..k ordered by
    document frequency descending with the gram string ascending as
    the deterministic tie-break. The first look every corpus audit
    takes (boilerplate discovery, df-cap calibration for the dedup
    operators, stopword candidates), sharing ``word_ngrams``'s exact
    gram construction so a gram's df here IS the df the dedup cap
    reasons about.

    Scale shape: gram explode over the scan → map-side partial
    aggregate folds each partition's grams before the one (gram,
    count) shuffle → global top-k via TakeOrdered (a k-row heap per
    partition + k-row merge at the driver, never a full sort)."""
    from pyspark.sql import Window

    from ._util import fan_out
    from .dedup import word_ngrams  # lazy: dedup imports from text

    if k <= 0:
        raise ValueError(f"need k > 0, got {k}")
    if n <= 0:
        raise ValueError(f"need n > 0, got {n}")
    text = F.col(text_col)
    return (
        fan_out(df).where(F.trim(text) != "")
        .select(F.explode(word_ngrams(text, n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), F.col("gram"))
        .limit(k)
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("df").desc(), F.col("gram")))
            .cast("int")
            .alias("rank"),
            "gram",
            "df",
        )
    )


def blocklist_report(
    df: DataFrame,
    words: Seq[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style blocklist filter report (Raffel et al. 2020 §2.2
    removed any page containing a word from the "List of Dirty,
    Naughty, Obscene or Otherwise Bad Words"; same machine, caller's
    list): one row per INPUT document (the gopher_quality universe
    rule) with ``n_blocked`` — distinct blocklist words present as
    lowercased whitespace tokens — and ``keep`` = no hit.

    Scale shape: blocklists are SMALL by definition (the published
    list is ~400 entries), so the list rides the plan as ONE array
    literal and the membership test is a pure codegen projection —
    ``array_intersect`` against the token array, no join, no
    shuffle, no Python (the bloom/classifier literal stance). For a
    reference set too large to inline, that is a different operator:
    ``bloom_contamination`` (bitmap literal) or ``contamination``
    (broadcast join) — this one deliberately stays the projection.

    Matching is exact-token (the published filter's semantics);
    substring/obfuscation matching is out of scope. Blank/NULL text
    → 0 tokens, n_blocked 0, keep true."""
    if not words:
        raise ValueError("blocklist_report: words must be non-empty")
    toks = F.filter(
        F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), WS),
        lambda x: x != "",
    )
    wl = F.lit(sorted({w.lower() for w in words}))
    n_blocked = F.size(F.array_intersect(toks, wl))
    return df.select(
        F.col(id_col),
        n_blocked.cast("int").alias("n_blocked"),
        (n_blocked == 0).alias("keep"),
    )


def token_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document Shannon entropy of the within-doc token
    distribution — the repetitiveness signal (template spam and
    looping generations sit near 0 nats; natural prose near
    ln(n_distinct)): H = ln n − (1/n)·Σ_t c_t·ln c_t over lowercased
    whitespace token counts c_t.

    Engine-exact under the suite's transcendental discipline
    (DIVERGENCES #25): each ln floor-quantizes at 1e-6 into BIGINT,
    the numerator n·lnq(n) − Σ c_t·lnq(c_t) is an exact integer sum
    (any aggregation order), and the entropy is that integer over
    n·10⁶ in ONE correctly-rounded division — any engine replays the
    identical double.

    Machine shape: explode → per-(doc, token) count (map-side
    combined) → per-doc aggregate → projection; both exchanges carry
    skinny (id, count) rows, linear in corpus token count. One row
    per INPUT doc (the filter-report universe rule): blank/NULL text
    → n_tokens 0, NULL entropy."""
    toks = F.filter(
        F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), WS),
        lambda x: x != "",
    )
    lnq = lambda c: F.floor(F.log(c.cast("double")) * F.lit(1e6) + F.lit(0.5)).cast(
        "long"
    )
    per_tok = (
        df.select(F.col(id_col), F.explode(toks).alias("_t"))
        .groupBy(id_col, "_t")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    per_doc = per_tok.groupBy(id_col).agg(
        F.sum("_c").alias("_n"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("_c") * lnq(F.col("_c"))).alias("_s"),
    )
    ent = (F.col("_n") * lnq(F.col("_n")) - F.col("_s")).cast("double") / (
        F.col("_n").cast("double") * F.lit(1e6)
    )
    scored = per_doc.select(
        id_col,
        F.col("_n").alias("n_tokens"),
        F.col("n_distinct"),
        ent.alias("entropy"),
    )
    return (
        df.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce(F.col("n_distinct"), F.lit(0).cast("long")).alias(
                "n_distinct"
            ),
            "entropy",
        )
    )


def readability_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document readability — Flesch Reading Ease and
    Flesch–Kincaid Grade Level (Flesch 1948; Kincaid et al. 1975),
    the classic prose-complexity quality signals (low ease / high
    grade flags legalese and machine-generated word salad; absurdly
    HIGH ease flags listicles and keyword stuffing). Returns
    (id_col, n_words, n_sentences, n_syllables, flesch, fk_grade)
    for documents with at least one word.

    Counting conventions, pinned so the oracle replays exactly:
    words = whitespace tokens (the family's WS rule); sentences =
    count of terminator runs [.!?]+, floored at 1 (prose without
    terminal punctuation is one sentence); syllables = vowel-group
    runs [aeiouy]+ of the lowercased text, floored at n_words (every
    word has ≥ 1 syllable — the standard heuristic, counted
    corpus-portably with one regexp instead of a dictionary).

      flesch   = 206.835 − 1.015·(words/sentences) − 84.6·(syll/words)
      fk_grade = 0.39·(words/sentences) + 11.8·(syll/words) − 15.59

    Each score is a fixed left-to-right chain of IEEE ops on exact
    integer counts, quantized by the module's ``quantize4`` floor
    rule — bit-deterministic in any engine. Pure codegen projection:
    no shuffle, no join, no Python."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    n_words = F.size(F.filter(F.split(F.trim(text), WS), lambda x: x != ""))
    n_sents = F.greatest(
        F.regexp_count(text, F.lit(r"[.!?]+")), F.lit(1)
    )
    n_syll = F.greatest(
        F.regexp_count(F.lower(text), F.lit(r"[aeiouy]+")), n_words
    )
    wps = n_words.cast("double") / n_sents.cast("double")
    spw = n_syll.cast("double") / n_words.cast("double")
    flesch = quantize4(
        F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    )
    fk = quantize4(
        F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    )
    return (
        df.select(
            F.col(id_col),
            n_words.cast("long").alias("n_words"),
            n_sents.cast("long").alias("n_sentences"),
            n_syll.cast("long").alias("n_syllables"),
            flesch.alias("flesch"),
            fk.alias("fk_grade"),
        )
        .where(F.col("n_words") > 0)
    )


__all__ = [
    "STOPWORDS",
    "PII_PATTERNS",
    "tokens",
    "blocklist_report",
    "token_entropy",
    "token_count",
    "text_stats",
    "quality_score",
    "readability_scores",
    "regex_token_count",
    "lang_id",
    "fingerprint",
    "chunk_documents",
    "ngram_repetition",
    "pack_ffd",
    "pack_sequences",
    "redact_pii",
    "top_ngrams",
    "gopher_quality",
]
