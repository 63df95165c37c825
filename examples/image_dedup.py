"""Multimodal near-dup dedup, end to end: binary payloads → banded
aHash pairs → transitive clusters → one keeper per duplicate group.

The stage every 100 TB image/document-scan pipeline runs before
training: perceptually-identical payloads (re-encoded thumbnails,
byte-shifted mirrors, template renders) must collapse to ONE kept
exemplar, and pairs alone don't do that — a~b, b~c means drop two of
{a, b, c}, which needs the transitive closure. This example wires the
r16 multimodal operators into the existing cluster/keeper machinery:

  1. build a corpus of binary payloads with PLANTED near-duplicates
     (the container has no image codecs, so payloads are the
     deterministic byte-profile stand-in the multimodal family pins —
     the plumbing is identical for real decoded pixels: see
     ``decode_image_features``'s mode contract);
  2. ``image_near_dup``: block-mean aHash signatures, pigeonhole
     band buckets, exact bit_count(xor) verify → (id_a, id_b,
     hamming) pairs — never an all-pairs comparison;
  3. ``dedup_clusters`` with those pairs: connected components over
     the pair graph (min-label, star-contraction escalation for
     chain shapes) elect cluster ids and a deterministic keeper;
  4. audit: every planted duplicate group collapses to one cluster
     with exactly one keeper, and unique payloads keep themselves.

    PYTHONPATH=/root/repo python examples/image_dedup.py [sf_dir]

pytest runs ``main`` at sf0.001
(tests/test_datapipe.py::test_image_dedup_example).
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from pipz_spark import get_session
from pipz_spark.datapipe import dedup_clusters, image_near_dup
from pipz_spark.sources.catalog import load_table


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None) -> dict:
    own_session = spark is None
    if own_session:
        spark = get_session("image-dedup-demo")

    # 1. payload corpus: every document's bytes, plus a perturbed
    # variant of every fifth doc (the e→a byte drift the declared
    # query uses — most variants land within Hamming 3 of their
    # base, a few drift past it, exactly like real re-encodes)
    docs = load_table(spark, "documents", sf_dir)
    s = F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), "[^\\x20-\\x7e]", "")
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"), s.alias("_s"))
    variants = base.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr("replace(_s, 'e', 'a')").alias("_s"),
    )
    corpus = base.unionByName(variants).select(
        "doc_id", F.encode(F.col("_s"), "utf-8").alias("blob")
    )
    n_payloads = corpus.count()

    # 2. near-dup pairs from the banded signature machine
    pairs = image_near_dup(corpus, max_hamming=3).select(
        F.col("id_a").alias("doc_id_a"), F.col("id_b").alias("doc_id_b")
    )
    n_pairs = pairs.count()
    print(f"{n_payloads} payloads → {n_pairs} near-dup pairs")

    # 3. transitive clusters + keeper election over the SAME id
    # universe (dedup_clusters re-elects keepers among present ids)
    clusters = dedup_clusters(
        corpus.select("doc_id"),
        pairs=pairs.select(
            F.col("doc_id_a").alias("id_a"), F.col("doc_id_b").alias("id_b")
        ),
        id_col="doc_id",
    )
    kept = clusters.where(F.col("is_keeper")).count()
    dropped = n_payloads - kept
    print(f"{kept} keepers, {dropped} near-duplicates dropped")

    # 4. audit — every pair's two ids share a cluster, and each
    # cluster has exactly one keeper
    lab = clusters.select("doc_id", "cluster_id", "is_keeper")
    joined = (
        pairs.join(
            lab.select(
                F.col("doc_id").alias("doc_id_a"),
                F.col("cluster_id").alias("_ca"),
            ),
            "doc_id_a",
        ).join(
            lab.select(
                F.col("doc_id").alias("doc_id_b"),
                F.col("cluster_id").alias("_cb"),
            ),
            "doc_id_b",
        )
    )
    split_pairs = joined.where(F.col("_ca") != F.col("_cb")).count()
    assert split_pairs == 0, "a near-dup pair must never straddle clusters"
    bad_keepers = (
        lab.groupBy("cluster_id")
        .agg(F.sum(F.col("is_keeper").cast("int")).alias("_k"))
        .where(F.col("_k") != 1)
        .count()
    )
    assert bad_keepers == 0, "every cluster elects exactly one keeper"
    print("audit: no pair straddles clusters; one keeper per cluster")

    if own_session:
        spark.stop()
    return {"payloads": n_payloads, "pairs": n_pairs, "kept": kept}


if __name__ == "__main__":
    main(*sys.argv[1:2])
