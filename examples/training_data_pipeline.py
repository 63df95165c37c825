"""End-to-end training-data pipeline over the documents corpus.

Runnable demo of the engine as a product, in the order a real corpus
assembly requires: quality scoring → gating (dead-letter queue) →
language ID → exact dedup → near-dup CLUSTER dedup (connected
components + canonical keeper) → benchmark decontamination (exact
n-gram AND GPT-3 near-dup halves) → DSIR importance weighting vs the
trusted tier → stratified language quota → deterministic
train/val/test split → sharded parquet output. Cluster dedup and decontamination run BEFORE
the split on purpose: splitting first would leave near-duplicate (or
benchmark-contaminated) documents straddling train and test —
exactly the leakage these stages exist to prevent.

    PYTHONPATH=/root/repo python examples/training_data_pipeline.py [sf_dir]

At 100 TB the SAME composition runs unchanged on a cluster — every
stage is expression/broadcast/banded-join shaped (see README scale
rules); only the session master and output paths change.
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

from pipz_spark import P, get_session, split_ok
from pipz_spark.control import Pipeline, observed_effect, collect_observation
from pipz_spark.datapipe import (
    bpe_token_count,
    contamination,
    cross_near_dup_pairs,
    dedup_clusters,
    deterministic_split,
    dsir_log_ratio,
    exact_dedup,
    lang_id,
    quality_score,
    stratified_sample,
    token_count,
)
from pipz_spark.sources.catalog import load_table
from pipz_spark.sources.sinks import write_parquet, write_split


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("training-data-pipeline")
    docs = load_table(spark, "documents", sf_dir)

    audit, obs = observed_effect(
        "audit", {"rows_in": F.count(F.lit(1)), "chars_in": F.sum("n_chars")}
    )
    # phase 1 — row-wise prep: the only stages that can dead-letter
    prep = Pipeline(
        "corpus-prep",
        P.sequence(
            "flow",
            audit,
            token_count(),
            # real BPE token budget alongside the whitespace/heuristic
            # counts — what the training run actually bills against
            bpe_token_count(),
            quality_score(),
            P.apply(
                "quality-gate",
                error_when=F.col("quality") < 0.5,
                message="below quality floor",
            ),
            lang_id(),
            exact_dedup(),
        ),
    )
    out = prep.run(spark, docs)

    with tempfile.TemporaryDirectory() as tmp:
        # land phase-1 survivors + dead letters ONCE; everything
        # downstream reads the parquet instead of re-executing the
        # prep lineage per action
        counts = write_split(out, f"{tmp}/prepped", f"{tmp}/dead_letter")
        metrics = collect_observation(obs, name="audit")
        print(f"ingested:  {metrics['rows_in']} docs, {metrics['chars_in']} chars")
        print(f"kept:      {counts['ok']}  dead-lettered: {counts['dead_letter']}")
        kept = spark.read.parquet(f"{tmp}/prepped")

        # phase 2 — corpus shaping: near-dup CLUSTER dedup (pairs
        # only say "a duplicates b"; the transitive closure keeps ONE
        # doc per duplicate group), then the per-language quota, then
        # the leak-proof split
        clusters = dedup_clusters(kept, threshold=0.7)
        print(
            "near-dup docs dropped by cluster keeper:",
            clusters.where(~F.col("is_keeper")).count(),
        )
        survivors = kept.join(
            clusters.where("is_keeper").select("doc_id"), "doc_id", "left_semi"
        )
        # benchmark decontamination: the demo treats every 50th doc as
        # the "benchmark" stand-in; a real pipeline loads its eval
        # suites here. Anti-join drops any survivor sharing a 4-gram.
        eval_set = docs.where(F.col("doc_id") % 50 == 0)
        dirty = contamination(survivors, eval_set, n=4)
        print("benchmark-contaminated docs dropped:", dirty.count())
        survivors = survivors.join(dirty.select("doc_id"), "doc_id", "left_anti")
        # ...and the FUZZY half (GPT-3 appendix C runs both): the
        # exact stage above only catches verbatim n-gram overlap; the
        # strictly-cross banded MinHash join also removes survivors
        # that NEAR-duplicate an eval doc (paraphrases, reflowed
        # copies) without sharing one exact 4-gram. Train plays the
        # "new" side, eval the reference index — docs are never
        # paired against their own split.
        fuzzy_dirty = (
            cross_near_dup_pairs(survivors, eval_set, threshold=0.7)
            .select(F.col("new_id").alias("doc_id"))
            .distinct()
        )
        print("near-dup contaminated docs dropped:", fuzzy_dirty.count())
        survivors = survivors.join(fuzzy_dirty, "doc_id", "left_anti")
        # DSIR importance weights (Xie et al. 2023): how much each
        # survivor resembles the TRUSTED subset (here: the top
        # quality-score tier stands in for a curated reference
        # corpus). A selection pipeline samples ∝ exp(weight); the
        # demo reports the spread so the signal is visible.
        trusted = survivors.where(F.col("quality") >= 0.8)
        w = dsir_log_ratio(survivors, trusted)
        spread = w.agg(
            F.min("dsir_logratio").alias("lo"), F.max("dsir_logratio").alias("hi")
        ).first()
        print(
            f"dsir weights vs trusted tier: [{spread['lo']:.4f}, {spread['hi']:.4f}]"
        )
        # GPT-3-style selection classifier (Brown et al. 2020 App. A):
        # logistic regression separating the trusted tier from the
        # pool — full-batch GD over a hashed vocabulary, the weight
        # vector riding each epoch's one corpus pass as a plan
        # literal (the k-means machine family). The published rule
        # then keeps a doc when pareto_draw < sigmoid(score).
        from pipz_spark.datapipe import train_quality_classifier

        clf = train_quality_classifier(
            survivors, F.col("quality") >= 0.8, epochs=2
        )
        csp = clf.where(F.col("label") == 0).agg(
            F.min("clf_score").alias("lo"), F.max("clf_score").alias("hi")
        ).first()
        print(f"classifier scores over the pool: [{csp['lo']:.3f}, {csp['hi']:.3f}]")
        # ... and the keep rule itself (pareto_keep): accept a pool
        # doc when the deterministic Pareto draw clears 1 − sigmoid —
        # the published recipe closed end-to-end. α=2 keeps a visible
        # share of a low-score pool; the paper's α=9 keeps ~1/512.
        from pipz_spark.datapipe import pareto_keep

        kept = pareto_keep(clf.where(F.col("label") == 0), alpha=2)
        print(
            f"GPT-3 keep rule: {kept.count()} of "
            f"{clf.where(F.col('label') == 0).count()} pool docs kept"
        )
        # weighted selection (priority sampling, Duffield et al.):
        # a reproducible length-weighted subsample — long documents
        # near-certain picks, short ones in ∝ weight; the kept set
        # supports unbiased token-count estimation
        from pipz_spark.datapipe import priority_sample

        n_pick = 50
        picked = priority_sample(survivors, n_pick, "n_chars")
        tok_share = picked.agg(F.sum("n_chars")).first()[0]
        print(
            f"priority sample: {picked.count()} of "
            f"{survivors.count()} docs carry {tok_share} chars"
        )
        assemble = P.sequence(
            "assemble",
            stratified_sample(
                "lang-mix", "doc_id", ["lang"], {"en": 0.5}, default_fraction=1.0
            ),
            deterministic_split("tvt", "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}),
        )
        final = split_ok(assemble(survivors))
        write_parquet(final, f"{tmp}/corpus", partition_by=["split"])

        corpus = spark.read.parquet(f"{tmp}/corpus")
        print("split sizes:", {r["split"]: r["n"] for r in
                               corpus.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()})
        print("language mix after quota:", {r["lang"]: r["n"] for r in
              corpus.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()})
        # phase 3 — sequence assembly for the trainer: sliding-window
        # chunks over the train split, then concat-and-chop packs of a
        # fixed token budget (what the dataloader actually consumes)
        from pipz_spark.datapipe import chunk_documents, pack_sequences

        train = corpus.where("split = 'train'")
        chunks = chunk_documents(train, size=64, stride=48)
        packs = pack_sequences(chunks, budget=512, shards=8)
        stats = packs.agg(
            F.count(F.lit(1)).alias("chunks"),
            F.sum("n_chunk_tokens").alias("tokens"),
            (F.count_distinct("shard", "pack_id")).alias("packs"),
        ).first()
        print(
            f"train assembly: {stats['chunks']} chunks, {stats['tokens']} tokens "
            f"packed into {stats['packs']} x 512-token packs"
        )

        # the dead letters were already landed — read them back rather
        # than re-executing the prep lineage for a sample
        dead = spark.read.parquet(f"{tmp}/dead_letter")
        print("dead-letter sample:", [r["doc_id"] for r in dead.select("doc_id").limit(3).collect()],
              "of", counts["dead_letter"])
    print("plan:")
    print(prep.root.render())
    spark.stop()


if __name__ == "__main__":
    main()
