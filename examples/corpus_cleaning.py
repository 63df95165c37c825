"""The published corpus-cleaning recipe, end to end.

The sequence every web-scale training corpus goes through, composed
from this repo's operators in the order the papers run them:

1. **Gopher quality rules** (Rae et al.) — drop documents failing the
   doc-level filters (word-count band, mean word length, alphabetic
   ratio, stopword presence, symbol ratio). Cheap single-projection
   scan, so it runs FIRST and shrinks everything downstream.
2. **C4 duplicate-line removal** — every distinct 8-token line
   survives once corpus-wide; boilerplate (navigation, license
   headers) disappears while unique prose stays.
3. **ExactSubstr repeated-span removal** — verbatim ≥20-char regions
   repeated across the surviving corpus are clipped per document.
4. **Exact dedup** of what remains (md5 keep-first), then a corpus
   profile before/after.
5. **CCNet perplexity tiers** (Wenzek et al.) — score the survivors
   under the corpus bigram LM and split each language into
   head/middle/tail quality thirds; the published recipe trains on
   head+middle and downweights or drops the tail.

    PYTHONPATH=/root/repo python examples/corpus_cleaning.py [sf_dir]

Order matters for cost: each stage's output is smaller and cleaner
than its input, and the expensive stages (line windows, span
frequency) never see documents the cheap rules already rejected.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from pipz_spark import get_session, split_ok
from pipz_spark.datapipe import (
    exact_dedup,
    gopher_quality,
    line_dedup,
    perplexity_buckets,
    remove_repeated_spans,
)
from pipz_spark.sources.catalog import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("example-corpus-cleaning")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    n0 = docs.count()

    # 1. Gopher rules — keep flags ride the report; join back the text
    quality = gopher_quality(docs)
    kept = docs.join(quality.where("keep").select("doc_id"), "doc_id")
    n1 = kept.count()

    # 2. corpus-wide duplicate-line removal; drop hollowed-out docs
    lines = line_dedup(kept, line_words=8)
    survived = lines.where(F.col("n_kept") > 0).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    n2 = survived.count()

    # 3. clip verbatim repeated spans (>= 20 chars, corpus-wide)
    clipped = remove_repeated_spans(survived, min_len=20).select(
        "doc_id", F.col("clean_text").alias("text")
    )

    # 4. exact dedup of the cleaned text (keep-first Step; duplicate
    # rows are dropped in place). Landed once to parquet: stages 4
    # AND 5 both consume it, and the CCNet pass scans the corpus
    # twice (LM fit + score) on top — re-executing the whole cascade
    # per action would dominate the demo
    import tempfile

    final = split_ok(exact_dedup()(clipped)).select("doc_id", "text")
    land = tempfile.mkdtemp(prefix="pipz_clean_") + "/cleaned"
    final.write.mode("overwrite").parquet(land)
    cleaned = spark.read.parquet(land)
    stats = cleaned.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.length("text")).alias("c")
    ).first()
    n3, chars = stats["n"], stats["c"] or 0
    print(
        f"{n0} docs -> gopher {n1} -> line-dedup {n2} -> "
        f"span-clip + exact-dedup {n3} ({chars} chars retained)"
    )

    # 5. CCNet quality tiers over the survivors (per-language thirds
    # by bigram-LM score; tier 1 = head). The published recipe keeps
    # head+middle for training.
    langs = load_table(spark, "documents", sf_dir).select("doc_id", "lang")
    tiers = perplexity_buckets(cleaned.join(langs, "doc_id"), buckets=3)
    dist = {
        (r["lang"], r["ppl_bucket"]): r["n"]
        for r in tiers.groupBy("lang", "ppl_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    kept_docs = tiers.where(F.col("ppl_bucket") <= 2).count()
    # bucket None = docs too short to score (kept visible, never sorted)
    shown = sorted(dist.items(), key=lambda kv: (kv[0][0], kv[0][1] or 0))
    print(f"ccnet tiers per (lang, bucket): {dict(shown)}")
    print(f"head+middle docs kept for training: {kept_docs} of {n3}")

    # 6. Benchmark decontamination, sketch-style: the doc_id % 50
    # split stands in for an eval benchmark; its n-grams build a
    # Bloom bitmap that rides the train scan as one literal — no
    # join, false positives only over-remove (the safe direction).
    from pipz_spark.datapipe import bloom_contamination

    # (run against the RAW corpus: the cleaning stages above already
    # removed repeated spans, which is exactly the text decontam
    # flags — published pipelines decontaminate BEFORE aggressive
    # span surgery so benchmark overlap is still visible)
    evalish = docs.where(F.col("doc_id") % 50 == 0)
    pool = docs.where(F.col("doc_id") % 50 != 0)
    contaminated = bloom_contamination(pool, evalish, n=4)
    n_dirty = contaminated.count()
    print(f"bloom decontam: {n_dirty} of {pool.count()} raw docs flagged")
    spark.stop()


if __name__ == "__main__":
    main()
