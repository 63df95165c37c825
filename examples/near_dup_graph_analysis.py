"""Graph analytics over the near-duplicate pair graph — the r14
graph operators composed with the dedup surface they were built for.

A near-dup pair list is a GRAPH, and the three graph machines answer
the questions a curation pipeline actually asks of it:

  1. ``near_dup_pairs`` — the MinHash-LSH pair stage (candidates by
     banded equi-join, exact-Jaccard verified),
  2. ``propagate_min_labels`` — distributed connected components
     over the pair graph: the zero-driver-state successor to
     ``dedup_clusters``'s capped union-find, and on a graph within
     the iteration diameter the two must AGREE label-for-label
     (asserted, not assumed),
  3. ``triangle_count`` — triangle density separates TEMPLATE
     cliques (every pair of members is itself a near-dup pair →
     triangle-rich) from chance hash collisions and chain-shaped
     drift (triangle-poor); the degree orientation keeps the wedge
     join bounded even on a clique-heavy pair graph,
  4. ``pagerank`` — centrality over the (symmetrized) pair graph
     ranks each cluster's most-connected member: an alternative
     keeper policy to min-id when the pipeline wants the most
     representative duplicate, computed with per-node DataFrame
     state (never collected),
  5. ``label_propagation`` — LPA communities REFINE the components:
     frequency voting stops at sparse cut edges, splitting a
     chained mirror farm into its template families (asserted:
     every community sits inside exactly one component),
  6. ``bfs_hops`` — chain depth from the chosen keepers: the max
     hop is the corpus's deepest mirror-of-a-mirror chain, and
     every clustered doc must be reachable from its keeper
     (asserted).

    PYTHONPATH=/root/repo python examples/near_dup_graph_analysis.py [sf_dir]

Scale posture: the pair graph is corpus-sized at 100 TB — every
stage here keeps per-node state distributed (labels, counts, ranks
are DataFrames), candidate generation stays bucketed, and the wedge
join is orientation-bounded at m^{3/2}. pytest runs ``main`` at
sf0.001 (tests/test_datapipe.py::test_near_dup_graph_example).
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from pipz_spark import get_session
from pipz_spark.datapipe import (
    dedup_clusters,
    near_dup_pairs,
    pagerank,
    propagate_min_labels,
    triangle_count,
)
from pipz_spark.sources.catalog import load_table


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None) -> dict:
    own_session = spark is None
    if own_session:
        spark = get_session("near-dup-graph-demo")
    docs = load_table(spark, "documents", sf_dir)

    # 1. the pair stage (threshold 0.7: template dups, not chance;
    # 48x12 signatures — the demo needs the graph, not 99% recall)
    pairs = near_dup_pairs(docs, threshold=0.7, num_hashes=48, bands=12)
    n_pairs = pairs.count()
    print(f"near-dup pairs: {n_pairs}")

    # the pair stage (minhash banding over the corpus) feeds SEVEN
    # graph consumers below, two of them round machines whose lazy
    # plans would re-embed it 2^rounds times — materialize it once
    edges = pairs.select(
        F.col("id_a").cast("string").alias("src"),
        F.col("id_b").cast("string").alias("dst"),
    ).localCheckpoint()

    # 2. distributed components vs the union-find clusters: within
    # the propagation diameter the labels must agree. The label frame
    # feeds THREE downstream consumers — localCheckpoint it once so
    # each does not replay the six Pregel rounds (the
    # checkpoint_every discipline, applied at the consumer boundary)
    labels = propagate_min_labels(edges, iters=6).localCheckpoint()
    uf = dedup_clusters(docs, pairs=pairs, threshold=0.7)
    joined = labels.join(
        uf.select(F.col("doc_id").cast("string").alias("node"), "cluster_id"),
        "node",
    )
    disagree = (
        joined.groupBy("cluster_id")
        .agg(F.count_distinct("label").alias("nl"))
        .where(F.col("nl") > 1)
        .count()
    )
    n_clusters = joined.select("label").distinct().count()
    print(f"components: {n_clusters} multi-doc clusters; label/union-find disagreements: {disagree}")
    assert disagree == 0, "Pregel labels must match union-find clusters"

    # 3. triangle density per node: template-clique members close
    # many triangles, chain/chance links close none
    tri = triangle_count(edges)
    dense = tri.where(F.col("triangles") >= 1).count()
    print(f"docs closing >=1 triangle (template-clique evidence): {dense}")

    # 3a. local clustering coefficient: the normalized form of the
    # same signal — template-clique members sit near lcc 1.0, chance
    # collisions and chain drift near 0.0
    from pipz_spark.datapipe import clustering_coefficient

    lcc = clustering_coefficient(edges)
    cliquey = lcc.where(F.col("lcc") >= 0.5).count()
    print(f"docs with lcc >= 0.5 (template membership): {cliquey}")

    # 3b. k-core peeling: the 2-core keeps only docs in cyclic
    # duplicate structure (chains and pendants peel away) — the
    # dense-template extraction the triangle counts hint at
    from pipz_spark.datapipe import kcore_peel

    core = kcore_peel(edges, k=2, rounds=4, checkpoint_every=1)
    n_core = core.count()
    print(f"docs in the 2-core (cyclic duplicate structure): {n_core}")

    # 4. centrality keeper: highest pagerank per component (fall
    # back to node id for ties) — per-node state stays distributed
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank(sym, iters=3)
    keeper = (
        labels.join(ranks, "node")
        .groupBy("label")
        .agg(F.max_by("node", F.struct("rank_q", "node")).alias("keeper"))
    )
    n_keepers = keeper.count()
    print(f"centrality keepers chosen: {n_keepers} (one per component)")

    # 5. LPA communities REFINE the components: frequency voting
    # stops at sparse cut edges, so a chained mirror farm splits
    # into its template families while min-label floods the whole
    # component — and every community must sit INSIDE one component
    # (asserted: community -> exactly one component label)
    from pipz_spark.datapipe import label_propagation

    comm = label_propagation(edges, iters=3)
    straddle = (
        comm.withColumnRenamed("label", "community")
        .join(labels, "node")
        .groupBy("community")
        .agg(F.count_distinct("label").alias("nc"))
        .where(F.col("nc") > 1)
        .count()
    )
    n_comm = comm.select("label").distinct().count()
    print(f"LPA communities: {n_comm} (>= components {n_clusters}); straddlers: {straddle}")
    assert straddle == 0, "every LPA community must sit inside one component"
    assert n_comm >= n_clusters

    # 6. chain depth from the keepers: BFS hops from the chosen
    # canonical docs measure mirror-of-a-mirror distance — every
    # clustered doc must be reached (same components), and the max
    # hop IS the deepest duplication chain in the corpus
    from pipz_spark.datapipe import bfs_hops

    # checkpoint the seed frame and the BFS rounds: each round's
    # frame references the previous one TWICE (standing map + new
    # candidates), so the lazy plan doubles per round — 2^iters
    # copies of the keeper lineage (labels ⨝ pagerank) OOMed the DAG
    # scheduler before truncation (measured failure mode). The 12
    # -round budget is IMPLIED by stage 2, not guessed: labels
    # converging within 6 rounds puts every node ≤ 6 hops from its
    # component's min-id node, so keeper-to-node ≤ keeper-to-min +
    # min-to-node ≤ 12 — full coverage is a theorem here, and the
    # assert enforces it
    seeds = keeper.select(F.col("keeper").alias("node")).localCheckpoint()
    depth = bfs_hops(edges, seeds, iters=12, symmetric=True, checkpoint_every=2)
    unreached = labels.join(depth, "node", "left_anti").count()
    max_depth = depth.agg(F.max("hops")).first()[0]
    print(f"deepest duplication chain from a keeper: {max_depth} hops; unreached clustered docs: {unreached}")
    assert unreached == 0, "keeper BFS must cover every clustered doc"

    if own_session:
        spark.stop()
    return {
        "n_pairs": n_pairs,
        "n_clusters": n_clusters,
        "dense_docs": dense,
        "n_core": n_core,
        "n_keepers": n_keepers,
        "n_communities": n_comm,
        "max_chain_depth": max_depth,
    }


if __name__ == "__main__":
    main(*sys.argv[1:2])
