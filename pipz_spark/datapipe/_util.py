"""Shared datapipe plumbing helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Rebalance an under-partitioned input ahead of a CPU-bound
    stage. A small table arrives from the scan as ONE input split
    (one parquet file < maxPartitionBytes), which would serialize the
    dense math that follows — minhash minima, simhash votes, embedding
    matmuls — on a single core while the rest of the executors idle
    (measured: the whole sf0.1 minhash signature pass ran on 1 of 32
    cores, 60% of the query's wall time).

    Only fans out when the scan provides fewer splits than the
    session's parallelism; at real scale the input already has
    thousands of splits and this is a no-op, so the round-robin
    shuffle only ever happens when it is by definition cheap (the
    whole input fits in fewer splits than there are cores).
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
