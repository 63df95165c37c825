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
from pipz_spark.datapipe import cross_near_dup_pairs, minhash_signatures_df
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
    print(f"corpus: {corpus.count()} docs, index at {idx_path}")

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

    print(f"final corpus: {corpus.count()} docs")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
