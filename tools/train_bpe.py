"""Train the pinned BPE merges fixture (classic byte-pair encoding).

Standard BPE training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"): start from the
per-character segmentation of every word, repeatedly merge the most
frequent adjacent symbol pair, record the merge. No end-of-word
marker — merges operate purely on in-word character sequences (the
operator's documented convention, see datapipe/bpe.py).

Fully deterministic: word frequencies come from the sf0.001 documents
table (a fixed fixture), pair counting is exact, and ties on count
break on the lexicographically smallest pair — re-running this script
byte-reproduces pipz_spark/datapipe/bpe_merges.txt.

The learned list is WELL-FORMED by construction: a merge's two
symbols each exist before it (base characters or products of earlier
merges). Well-formedness is what makes "apply merges one at a time in
rank order" equivalent to the canonical lowest-rank-pair-first BPE
application loop — the property the SQL oracle's sequential
rank-ordered replace depends on (tested in tests/test_datapipe.py).

Usage: python tools/train_bpe.py [n_merges] [sf_dir]
"""

from __future__ import annotations

import collections
import re
import sys

# must stay identical to datapipe/bpe.py:PRETOKEN_PATTERN
PRETOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \x00-\x1f]")


def word_frequencies(sf_dir: str) -> dict[str, int]:
    import duckdb

    rows = duckdb.sql(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    freq: collections.Counter[str] = collections.Counter()
    for (text,) in rows:
        if text:
            freq.update(PRETOKEN_RE.findall(text))
    return dict(freq)


def train(freq: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    # single implementation lives next to the operator it feeds (also
    # reached distributed via datapipe.bpe.bpe_train)
    from pipz_spark.datapipe.bpe import train_merges

    return train_merges(freq, n_merges)


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    freq = word_frequencies(sf_dir)
    merges = train(freq, n_merges)
    out = "pipz_spark/datapipe/bpe_merges.txt"
    with open(out, "w") as f:
        f.write(f"#version: pipz-bpe 1 (trained on sf0.001 documents, {len(merges)} merges)\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    print(f"{len(merges)} merges -> {out} ({len(freq)} distinct words)")


if __name__ == "__main__":
    main()
