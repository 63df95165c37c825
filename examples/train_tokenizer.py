"""Train a BPE tokenizer on the corpus, then budget with it.

The producer/consumer loop a real training-data pipeline runs:
``bpe_train`` learns a merge table from the corpus itself (one
distributed pre-token histogram, then the exact Sennrich merge loop
over the vocabulary — the histogram is Heaps'-law bounded, so the
driver step stays small however big the corpus is), ``save_merges``
pins it to a file, and ``bpe_token_count`` tokenizes with the table
just trained — so downstream token budgets are measured in the
tokenizer's OWN tokens, not a proxy count.

    PYTHONPATH=/root/repo python examples/train_tokenizer.py [sf_dir] [n_merges]

Determinism: re-running this script on the same corpus reproduces the
same merge table byte-for-byte (exact counts, lexicographic tie
break), so a pinned tokenizer can be re-derived, audited, or extended
(train with a larger n_merges — the first N merges never change).
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import functions as F

from pipz_spark import get_session, split_ok
from pipz_spark.datapipe import bpe_train, save_merges, bpe_token_count
from pipz_spark.sources.catalog import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_session("example-train-tokenizer")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, "documents", sf_dir)

    merges = bpe_train(docs, n_merges=n_merges)
    fd, path = tempfile.mkstemp(prefix="pipz_merges_", suffix=".txt")
    os.close(fd)  # save_merges reopens by path; mkstemp avoids the
    # mktemp name-reservation race under concurrent runs
    save_merges(merges, path, note=f"trained on {sf_dir}")
    print(f"trained {len(merges)} merges -> {path}")
    print("first 10:", merges[:10])

    # tokenize the same corpus with the table just trained
    toks = split_ok(bpe_token_count(merges_path=path)(docs))
    stats = toks.agg(
        F.sum("n_bpe_tokens").alias("total_tokens"),
        F.avg("n_bpe_tokens").alias("mean_tokens"),
    ).first()
    print(
        f"corpus: {stats['total_tokens']} BPE tokens "
        f"(mean {stats['mean_tokens']:.1f}/doc)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
