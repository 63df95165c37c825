"""Incremental crawl deduplication against a growing corpus.

Runnable demo of the production shape for ``cross_near_dup_pairs``:
sign the existing corpus ONCE and persist the compact signature
index; then for every incoming batch, dedup the batch against the
index (never corpus×corpus), keep only novel documents, and extend
BOTH the corpus and the index with the survivors' rows — each batch
costs one scan of the batch plus a bucketed join against the index.

    PYTHONPATH=/root/repo python examples/incremental_crawl_dedup.py [sf_dir]

At 100 TB the same loop runs unchanged: the index is one compact row
per corpus document (write it bucketed on (band, band_hash) for a
co-located candidate join), batches are small by definition, and the
candidate stage's per-task output is bounded by construction even
when a viral template floods one bucket.
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

from pipz_spark import get_session
from pipz_spark.datapipe import (
    cross_near_dup_pairs,
    minhash_signatures_df,
    winnow_fingerprints,
    winnow_overlap,
)
from pipz_spark.sources.catalog import load_table

NUM_HASHES = 120  # part of the index's identity — batches must match


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_session("incremental-dedup-demo")
    docs = load_table(spark, "documents", sf_dir)

    # bootstrap: 70% existing corpus, two incoming "crawl" batches
    corpus = docs.where(F.col("doc_id") % 10 < 7)
    batches = [
        docs.where(F.col("doc_id") % 10 == 7),
        docs.where(F.col("doc_id") % 10 > 7),
    ]

    work = tempfile.mkdtemp(prefix="pipz_incr_dedup_")
    idx_path = f"{work}/signature_index"
    minhash_signatures_df(corpus, num_hashes=NUM_HASHES).write.mode(
        "overwrite"
    ).parquet(idx_path)
    # second persisted signature: the winnow fingerprint index
    # (MOSS), ~2/(w+1) of a full shingle index — the CONTAMINATION
    # currency: eval sets are screened against it later without ever
    # re-fingerprinting the corpus
    win_path = f"{work}/winnow_index"
    winnow_fingerprints(corpus, k=3, w=4).select(
        F.col("doc_id").alias("train_id"), "fp_hash"
    ).write.mode("overwrite").parquet(win_path)
    print(f"corpus: {corpus.count()} docs, indexes at {idx_path} / {win_path}")

    for i, batch in enumerate(batches):
        index = spark.read.parquet(idx_path)
        dups = cross_near_dup_pairs(
            batch, corpus, threshold=0.7, num_hashes=NUM_HASHES, ref_sigs=index
        )
        dup_ids = dups.select(F.col("new_id").alias("doc_id")).distinct()
        novel = batch.join(dup_ids, "doc_id", "left_anti")
        n_batch, n_dup, n_novel = batch.count(), dup_ids.count(), novel.count()
        print(
            f"batch {i}: {n_batch} docs -> {n_dup} near-dups of the corpus "
            f"dropped, {n_novel} novel kept"
        )
        # the survivors join the corpus AND the index (append = one
        # batch-sized write; no corpus rewrite)
        corpus = corpus.unionByName(novel)
        minhash_signatures_df(novel, num_hashes=NUM_HASHES).write.mode(
            "append"
        ).parquet(idx_path)
        winnow_fingerprints(novel, k=3, w=4).select(
            F.col("doc_id").alias("train_id"), "fp_hash"
        ).write.mode("append").parquet(win_path)

    print(f"final corpus: {corpus.count()} docs")

    # contamination screen: an eval benchmark arrives AFTER the
    # corpus is built — fingerprint only the (small) eval set and
    # join it against the persisted index; the corpus is never
    # rescanned (the dp_cross_winnow shape, df-capped like every
    # fingerprint join in the family)
    eval_set = docs.where(F.col("doc_id") % 17 == 3)
    ef = winnow_fingerprints(eval_set, k=3, w=4).select(
        F.col("doc_id").alias("eval_id"), "fp_hash"
    )
    hits = winnow_overlap(
        spark.read.parquet(win_path), ef, min_shared=2, max_doc_freq=64
    )
    n_pairs = hits.count()
    n_eval = hits.select("eval_id").distinct().count()
    print(
        f"contamination screen: {eval_set.count()} eval docs vs the index -> "
        f"{n_pairs} overlapping pairs, {n_eval} contaminated eval docs"
    )
    assert n_eval > 0, "eval slice overlaps the corpus by construction"
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
