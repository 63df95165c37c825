"""End-to-end training-data pipeline over the documents corpus.

Runnable demo of the engine as a product: quality scoring → gating →
language ID → exact dedup → near-dup CLUSTER dedup (connected
components + canonical keeper) → stratified language mix →
deterministic train/val/test split → sharded parquet output with a
dead-letter queue.

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
    deterministic_split,
    exact_dedup,
    lang_id,
    quality_score,
    token_count,
)
from pipz_spark.sources.catalog import load_table
from pipz_spark.sources.sinks import write_split


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("training-data-pipeline")
    docs = load_table(spark, "documents", sf_dir)

    audit, obs = observed_effect(
        "audit", {"rows_in": F.count(F.lit(1)), "chars_in": F.sum("n_chars")}
    )
    prep = Pipeline(
        "corpus-prep",
        P.sequence(
            "flow",
            audit,
            token_count(),
            quality_score(),
            P.apply(
                "quality-gate",
                error_when=F.col("quality") < 0.5,
                message="below quality floor",
            ),
            lang_id(),
            exact_dedup(),
            deterministic_split("tvt", "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}),
        ),
    )
    out = prep.run(spark, docs)

    with tempfile.TemporaryDirectory() as tmp:
        counts = write_split(out, f"{tmp}/corpus", f"{tmp}/dead_letter")
        metrics = collect_observation(obs, name="audit")
        print(f"ingested:  {metrics['rows_in']} docs, {metrics['chars_in']} chars")
        print(f"kept:      {counts['ok']}  dead-lettered: {counts['dead_letter']}")
        kept = spark.read.parquet(f"{tmp}/corpus")
        print("split sizes:", {r["split"]: r["n"] for r in
                               kept.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()})
        # pair generation is only half of near-dup dedup: the
        # transitive closure groups a~b~c into ONE cluster and keeps
        # exactly one canonical doc per group
        from pipz_spark.datapipe import dedup_clusters, stratified_sample

        kept_docs = split_ok(out)
        clusters = dedup_clusters(kept_docs, threshold=0.7)
        n_clustered = clusters.where(~F.col("is_keeper")).count()
        print(f"near-dup docs dropped by cluster keeper: {n_clustered}")
        survivors = kept_docs.join(
            clusters.where("is_keeper").select("doc_id"), "doc_id", "left_semi"
        )
        # per-language quota: downsample the dominant language, keep
        # the rest whole (content-hash-stable across runs/clusters)
        mix = stratified_sample("lang-mix", "doc_id", ["lang"], {"en": 0.5},
                                default_fraction=1.0)
        mixed = split_ok(mix(survivors))
        print("language mix after quota:", {r["lang"]: r["n"] for r in
              mixed.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()})
    print("plan:")
    print(prep.root.render())
    spark.stop()


if __name__ == "__main__":
    main()
