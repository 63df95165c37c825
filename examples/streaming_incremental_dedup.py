"""Streaming ingestion with incremental near-dup dedup per micro-batch.

The composition a live crawl pipeline runs: documents arrive as a
stream; every micro-batch first self-dedups (near-dups can share a
trigger), then checks its survivors AGAINST THE PERSISTED CORPUS
SIGNATURE INDEX inside ``foreachBatch`` (batch×index, never
corpus×corpus); novel documents land in the corpus sink and their
signatures append to the index — so batch N+1 automatically dedups
against everything batch N admitted.

    PYTHONPATH=/root/repo python examples/streaming_incremental_dedup.py [sf_dir]

At 100 TB the same loop holds: the index is one compact signature row
per corpus doc (bucket it on (band, band_hash) for co-located
candidate joins), each trigger costs one batch-sized signature pass
plus a bucketed join against the index, and the index append is
batch-sized. Exactly-once comes from the landing sink's idempotency
(merge-on-read keyed by doc_id) plus the checkpoint.
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

from pipz_spark import get_session
from pipz_spark.datapipe import (
    cross_near_dup_pairs,
    minhash_signatures_df,
    near_dup_pairs,
)
from pipz_spark.sources.catalog import load_table

NUM_HASHES = 120


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_session("streaming-incremental-dedup")
    docs = load_table(spark, "documents", sf_dir)

    work = tempfile.mkdtemp(prefix="pipz_stream_dedup_demo_")
    idx_path = f"{work}/signature_index"
    corpus_path = f"{work}/corpus"
    stream_src = f"{work}/incoming"

    # bootstrap: 60% existing corpus, signed once
    corpus = docs.where(F.col("doc_id") % 10 < 6)
    corpus.write.parquet(corpus_path)
    minhash_signatures_df(corpus, num_hashes=NUM_HASHES).write.parquet(idx_path)
    # the remaining docs arrive as a 2-file stream (one per trigger);
    # duplicates WITHIN the stream of the same corpus family dedup
    # against batch N's admissions via the index append
    incoming = docs.where(F.col("doc_id") % 10 >= 6)
    incoming.repartition(2).write.parquet(stream_src)
    print(f"bootstrap: {corpus.count()} corpus docs, index at {idx_path}")

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_src)
    )

    def dedup_batch(batch, batch_id: int) -> None:
        # 1. WITHIN-batch self-dedup: near-dups of the same family
        # routinely share a trigger, and neither would collide with
        # the index yet — drop each pair's higher id (canonical keep)
        self_dups = near_dup_pairs(batch, threshold=0.7, num_hashes=NUM_HASHES)
        self_drop = self_dups.select(F.col("id_b").alias("doc_id")).distinct()
        survivors = batch.join(self_drop, "doc_id", "left_anti")
        # 2. CROSS check against the persisted index
        index = spark.read.parquet(idx_path)
        dups = cross_near_dup_pairs(
            survivors, spark.read.parquet(corpus_path),
            threshold=0.7, num_hashes=NUM_HASHES, ref_sigs=index,
        )
        dup_ids = dups.select(F.col("new_id").alias("doc_id")).distinct()
        # materialize novel to a batch-scoped scratch path BEFORE
        # appending: novel's lineage reads corpus_path, so appending
        # directly under a .persist() pin is subtly unsafe — if a
        # cached partition were evicted and recomputed mid-append it
        # would re-read the corpus directory INCLUDING the files this
        # very write is adding, changing dup_ids nondeterministically
        # (r8 advisor). The scratch write cuts the lineage for good
        # (batch-sized, so it costs one extra batch write at any
        # scale), and the read-back feeds the count + both sinks.
        scratch = f"{work}/novel_{batch_id}"
        survivors.join(dup_ids, "doc_id", "left_anti").write.parquet(scratch)
        novel = spark.read.parquet(scratch)
        n_batch, n_novel = batch.count(), novel.count()
        novel.write.mode("append").parquet(corpus_path)
        minhash_signatures_df(novel, num_hashes=NUM_HASHES).write.mode(
            "append"
        ).parquet(idx_path)
        print(
            f"  batch {batch_id}: {n_batch} arrived, "
            f"{n_batch - n_novel} near-dups dropped, {n_novel} admitted"
        )

    q = (
        stream.writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", f"{work}/ckpt")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    final = spark.read.parquet(corpus_path)
    print(f"final corpus: {final.count()} docs (all admissions deduped)")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
