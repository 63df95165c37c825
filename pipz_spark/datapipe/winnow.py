"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
2003 — the MOSS local fingerprinting algorithm).

Where ``text.fingerprint`` hashes the WHOLE document (exact-dup key)
and the shingle family feeds similarity joins, winnowing selects a
guaranteed-coverage SUBSET of k-gram hashes: slide a window of ``w``
consecutive gram hashes over the document and keep each window's
minimum (rightmost occurrence on ties — standard winnowing's tie
rule in the paper; its ROBUST variant additionally prefers the hash
the previous window already selected, a density optimization this
implementation does not apply).
The paper's guarantee: any match of at least w + k - 1 consecutive
tokens between two documents shares at least one selected
fingerprint, at an expected density of 2/(w+1) of all grams — the
index stays ~w/2× smaller than a full shingle index with NO recall
loss above the guarantee threshold, which is exactly the overlap
detector a 100 TB corpus can afford to build.

Spark shape: ONE pure projection per document — tokens → gram-hash
array → per-window (min, rightmost-pos) structs → array_distinct →
explode. No shuffle anywhere (the output is already keyed by the
input's partitioning); every step is a codegen higher-order array
expression (transform/slice/array_min), never Python. Cost is
O(tokens · w) expression work per doc, the algorithm's intrinsic
bound.

Engine-exact: gram hashes are the repo's md5-prefix→BIGINT idiom,
selection is pure integer/array logic — DuckDB replays fingerprints
row-for-row (window MIN over a rows-frame + rightmost join-back).

Gram semantics follow the contamination family: lowercased,
whitespace-tokenized; documents shorter than ``k`` tokens contribute
their full token run as ONE gram; documents with fewer grams than
``w`` yield one window over all grams; empty/whitespace-only
documents are excluded.

Reference parity: the reference engine has no fingerprinting
operator — LLM-data-pipeline surface (SURVEY §2 datapipe family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import WS


def _gram_hash(gram: Column, salt: str) -> Column:
    return F.conv(
        F.substring(F.md5(F.concat(gram, F.lit(salt))), 1, 13), 16, 10
    ).cast("long")


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
    salt: str = "win",
) -> DataFrame:
    """Select winnowing fingerprints per document: one row per
    DISTINCT selected (hash, position) — (id_col, fp_hash BIGINT,
    fp_pos INT), fp_pos the 1-based gram index whose hash was
    selected. Joining two corpora's outputs on fp_hash finds every
    pair sharing ≥ w + k - 1 consecutive tokens (the winnowing
    guarantee); positions localize the match."""
    if k <= 0 or w <= 0:
        raise ValueError(f"need k > 0 and w > 0, got {k}, {w}")
    toks = F.filter(
        F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), WS),
        lambda x: x != "",
    )
    # STAGED projections, deliberately: the token and hash arrays
    # must be NAMED attributes, not inlined subtrees — inside nested
    # higher-order lambdas Catalyst does no common-subexpression
    # elimination, so a single-projection formulation re-evaluates
    # the full md5 gram array once PER WINDOW (O(n²·w) per doc; the
    # json_parse_props canary's lesson). Spark's CollapseProject
    # declines to merge these because the refs are non-cheap and
    # multiply referenced — asserted by the dp_winnow plan canary
    # (exactly one md5 in the plan).
    #
    # fan_out first (r16 perf pass): the O(tokens·w) md5 + window
    # expression work is the family's densest per-row math, and a
    # small corpus arrives from the scan as ONE split — the whole
    # fingerprint pass serialized on a single core (the dedup/text
    # family's measured lesson, _util.fan_out docstring). No-op at
    # real scale where the scan is already wide.
    from ._util import fan_out

    staged = fan_out(
        df.where(F.trim(F.coalesce(F.col(text_col), F.lit(""))) != "")
    ).select(F.col(id_col), toks.alias("_toks"))
    # gram positions 1..max(n-k+1, 1); slice() truncates for short
    # docs, so position 1 of a sub-k doc is the whole token run
    n_grams = F.greatest(F.size("_toks") - F.lit(k - 1), F.lit(1))
    hashes = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: _gram_hash(
            F.concat_ws(" ", F.slice(F.col("_toks"), i, k)), salt
        ),
    )
    hashed = staged.select(F.col(id_col), hashes.alias("_hs"))

    def window_struct(s: Column) -> Column:
        win = F.slice(F.col("_hs"), s, w)
        mn = F.array_min(win)
        # rightmost in-window index holding the min (the paper's
        # standard-winnowing tie rule): max j with win[j] == min
        rj = F.array_max(
            F.transform(
                F.sequence(F.lit(1), F.size(win)),
                lambda j: F.when(F.element_at(win, j) == mn, j).otherwise(
                    F.lit(0)
                ),
            )
        )
        return F.struct(
            mn.alias("fp_hash"), (s + rj - 1).cast("int").alias("fp_pos")
        )

    n_wins = F.greatest(F.size("_hs") - F.lit(w - 1), F.lit(1))
    fps = F.array_distinct(
        F.transform(F.sequence(F.lit(1), n_wins), window_struct)
    )
    return hashed.select(F.col(id_col), F.explode(fps).alias("_fp")).select(
        id_col, F.col("_fp.fp_hash"), F.col("_fp.fp_pos")
    )


def winnow_overlap(
    train_fps: DataFrame,
    eval_fps: DataFrame,
    train_id: str = "train_id",
    eval_id: str = "eval_id",
    min_shared: int = 2,
    max_doc_freq: int = 64,
) -> DataFrame:
    """The MOSS composition (Schleimer et al. §5): join two
    fingerprint frames (``winnow_fingerprints`` output, or a
    PERSISTED index of it — the incremental-contamination story:
    fingerprint the training corpus once, store the skinny
    (id, fp_hash) index, and screen every future eval set against it
    without re-fingerprinting 100 TB) on ``fp_hash`` and count the
    shared fingerprints per (train, eval) document pair. Returns
    (train_id, eval_id, n_shared BIGINT) for pairs with
    ``n_shared >= min_shared``.

    ``max_doc_freq`` caps the TRAIN-side document frequency of a
    joinable fingerprint — PART OF THE SEMANTICS, the dedup family's
    df-cap convention (``dedup.jaccard_near_dup_pairs``): a print
    selected from web boilerplate lands in a large fraction of both
    corpora, and its candidate fan-out is train_df × eval_df — the
    chance-collision explosion, and at scale a skewed hot key in the
    shuffle. Capping bounds every print's pair fan-out a priori at
    ``max_doc_freq × eval_df`` while dropping exactly the LEAST
    informative prints. The winnowing guarantee degrades gracefully:
    a ≥ w+k−1-token shared run surfaces unless EVERY print it
    selects is over-cap boilerplate — in which case the run itself
    is boilerplate. ``min_shared`` damps single-gram chance
    collisions (2 is the family default).

    Scale shape: distinct → one map-side-combined df count over the
    train index → df-cap semi-shape join → equi-join on fp_hash →
    two-phase count per pair. Never all-pairs, never a cartesian;
    both inputs stay skinny (id, hash) longs end to end. The
    per-pair count is COUNT(*), exact because each side is distinct
    (the triple (fp, train, eval) is unique in the join output)."""
    if min_shared <= 0:
        raise ValueError(f"need min_shared > 0, got {min_shared}")
    if max_doc_freq <= 0:
        raise ValueError(f"need max_doc_freq > 0, got {max_doc_freq}")
    t = train_fps.select(F.col(train_id), "fp_hash").distinct()
    e = eval_fps.select(F.col(eval_id), "fp_hash").distinct()
    keep = (
        t.groupBy("fp_hash")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") <= max_doc_freq)
        .select("fp_hash")
    )
    return (
        t.join(keep, "fp_hash")
        .join(e, "fp_hash")
        .groupBy(train_id, eval_id)
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


__all__ = ["winnow_fingerprints", "winnow_overlap"]
