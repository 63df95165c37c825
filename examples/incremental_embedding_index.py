"""Incremental semantic dedup against a persisted embedding index.

The vector-side twin of ``incremental_crawl_dedup``: project the
existing corpus through the LSH family ONCE (``embedding_index``),
persist the index, then for every incoming batch of embeddings find
which are semantic near-duplicates of the corpus
(``cross_embedding_pairs``) without ever re-projecting the corpus —
each batch costs one Arrow-batched projection of the batch plus one
bucket shuffle against the index rows. Novel vectors extend both the
corpus and the index with an append-only write.

    PYTHONPATH=/root/repo python examples/incremental_embedding_index.py [sf_dir]

The LSH family (bits/tables/seed/dim) is the index's identity; it
rides in the index's schema metadata through the parquet round-trip,
and ``cross_embedding_pairs`` adopts it from there — batches can
never accidentally sign with a different family. At 100 TB, write the
index bucketed on (_tbl, _sig) so the per-batch candidate stage joins
co-located.
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

from pipz_spark import get_session
from pipz_spark.datapipe import cross_embedding_pairs, embedding_index
from pipz_spark.sources.catalog import load_table


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_session("incremental-embed-index-demo")
    emb = load_table(spark, "embeddings", sf_dir)

    corpus = emb.where(F.col("vec_id") % 10 < 7)
    batches = [
        emb.where(F.col("vec_id") % 10 == 7),
        emb.where(F.col("vec_id") % 10 > 7),
    ]

    work = tempfile.mkdtemp(prefix="pipz_embed_index_")
    idx_path = f"{work}/embedding_index"
    # probe the dimension ONCE at bootstrap and pass it explicitly
    # from then on: a mature corpus routinely yields an all-duplicate
    # batch, and indexing its EMPTY novel set must append nothing —
    # not crash embedding_index's dim probe (r8 review)
    dim = corpus.select(F.size("embedding")).first()[0]
    # fine buckets + many tables: high recall at the near-dup band
    embedding_index(corpus, bits=3, tables=32, dim=dim).write.mode(
        "overwrite"
    ).parquet(idx_path)
    print(f"corpus: {corpus.count()} vectors, index at {idx_path}")

    for i, batch in enumerate(batches):
        index = spark.read.parquet(idx_path)  # family rides in metadata
        dups = cross_embedding_pairs(batch, threshold=0.35, ref_index=index)
        dup_ids = dups.select(F.col("new_id").alias("vec_id")).distinct()
        novel = batch.join(dup_ids, "vec_id", "left_anti")
        print(
            f"batch {i}: {batch.count()} vectors -> {dup_ids.count()} "
            f"semantic near-dups of the corpus dropped, {novel.count()} novel kept"
        )
        corpus = corpus.unionByName(novel)
        embedding_index(novel, bits=3, tables=32, dim=dim).write.mode(
            "append"
        ).parquet(idx_path)

    print(f"final corpus: {corpus.count()} vectors")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
