"""Semantic similarity + mixture rebalancing over the embeddings and
documents corpora.

Runnable demo of the round-6 similarity/sampling surface, in the
order an embedding-aware corpus pass runs them: semantic near-dup
pairs → cluster dedup on the embedding graph → ANN top-k retrieval
three ways (LSH / IVF / PQ+rerank, one call each, same output shape)
→ temperature-flattened language rebalancing of the surviving docs.

    PYTHONPATH=/root/repo python examples/semantic_search_and_rebalance.py [sf_dir]

Scale posture per stage: near-dup candidates come from multi-table
hyperplane buckets (equi-join, never all-pairs); cluster labels are
skinny (long,long) propagation shuffles; the three ANN paths share
the no-cross-join discipline — PQ additionally shuffles only
(qid, nid, approx) partials, the smallest footprint of the three;
temperature rates are a |strata|-row broadcast. The same composition
runs unchanged on a cluster.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from pipz_spark import get_session, split_ok
from pipz_spark.datapipe import (
    cosine_topk_ivf,
    cosine_topk_lsh,
    cosine_topk_pq,
    embedding_near_dup_pairs,
    semantic_dedup,
    temperature_resample,
)
from pipz_spark.sources.catalog import load_table


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_session("semantic-search-demo")
    emb = load_table(spark, "embeddings", sf_dir)
    docs = load_table(spark, "documents", sf_dir)

    # 1. semantic near-dups: cosine >= 0.4 via bucketed candidates
    pairs = embedding_near_dup_pairs(emb, threshold=0.4, bits=3, tables=32)
    print(f"semantic near-dup pairs: {pairs.count()}")

    # 2. SemDeDup — the packaged pair-graph → closure → keeper
    # composition (equivalent to feeding the pairs above into
    # dedup_clusters by hand, which is exactly what it does)
    clusters = semantic_dedup(emb, threshold=0.4, bits=3, tables=32)
    n_dropped = clusters.where("NOT is_keeper").count()
    print(f"semantic duplicates dropped: {n_dropped}")

    # 2b. the published SemDeDup recipe's FIRST stage (Abbas et al.
    # 2023 cluster the corpus with k-means before in-cell pruning):
    # distributed Lloyd over the same embeddings — one corpus pass
    # per iteration, centroid state bounded on the driver
    from pipz_spark.datapipe import kmeans_embeddings

    cells = kmeans_embeddings(emb, k=8, iters=2)
    sizes = sorted(
        r["n"]
        for r in cells.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    print(f"k-means cells (k=8, 2 Lloyd iterations): sizes {sizes}")

    # 2c. All-but-the-Top-style inspection (Mu & Viswanath 2018):
    # project onto the top principal component — embedding sets with
    # a dominant common direction benefit from removing it before
    # cosine work; the projection spread is the diagnostic
    from pipz_spark.datapipe import pca_project

    pc = pca_project(emb, iters=3)
    spread = pc.agg(F.min("pc1").alias("lo"), F.max("pc1").alias("hi")).first()
    print(f"top-PC projection spread: [{spread['lo']:.4f}, {spread['hi']:.4f}]")

    # 3. the same top-k question, three index strategies
    queries = emb.where(F.col("vec_id") < 5)
    for label, fn in (
        ("lsh", lambda: cosine_topk_lsh(emb, queries, k=3, bits=3, tables=24)),
        ("ivf", lambda: cosine_topk_ivf(emb, queries, k=3, nlist=8, nprobe=8)),
        ("pq ", lambda: cosine_topk_pq(emb, queries, k=3, m=32, ksub=64, shortlist=64)),
    ):
        top = fn()
        hit = top.where("rank = 1").orderBy("qid").first()
        print(f"ann[{label}]: {top.count()} results; q{hit['qid']} top nid={hit['nid']} cos={hit['cos']}")

    # 3b. hybrid retrieval: fuse the lexical BM25 ranking with the
    # exact cosine ranking through ranks alone (RRF) — the two
    # rankers score on incommensurable scales, the fusion doesn't
    # care — then MMR-diversify the fused list so the final pool
    # isn't k near-copies of the same hit (the eval-set/few-shot
    # construction recipe end to end)
    from pipz_spark.datapipe import (
        bm25_topk,
        cosine_topk_bruteforce,
        mmr_rerank,
        rrf_fuse,
    )

    lex = bm25_topk(docs, [(0, "hash join"), (1, "fast vector query")], k=10)
    vec = cosine_topk_bruteforce(
        emb, emb.where(F.col("vec_id") <= 1), k=10
    ).select(
        F.col("qid").alias("query_id"), F.col("nid").alias("doc_id"), "rank"
    )
    fused = rrf_fuse([lex, vec], k=10)
    n_both = fused.where("n_lists = 2").count()
    print(f"rrf fused: {fused.count()} ranked rows; found by both rankers: {n_both}")
    cands = fused.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    ).select("query_id", "doc_id", F.col("rrf").alias("rel"), "embedding")
    diverse = mmr_rerank(cands, k=4)
    print(f"mmr-diversified pool: {diverse.count()} rows "
          f"({diverse.select('query_id').distinct().count()} queries x 4)")

    # 4. flatten the language mixture of the doc corpus at 50% target
    step = temperature_resample("lang-flatten", "doc_id", "lang", 0.5)
    kept = split_ok(step(docs))
    before = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    after = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang in sorted(before):
        print(f"  {lang}: {before[lang]:4d} -> {after.get(lang, 0):4d}"
              f"  (rate {after.get(lang, 0) / before[lang]:.2f})")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
