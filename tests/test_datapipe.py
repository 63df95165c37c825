"""Unit tests for the LLM-data-pipeline operators (datapipe)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipz_spark import split_ok
from pipz_spark.datapipe import (
    attach_blob,
    blob_metadata,
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    decode_image_features,
    exact_dedup,
    fingerprint,
    lang_id,
    near_dup_pairs,
    quality_score,
    sample_frames,
    simhash,
    simhash_near_dup_pairs,
    text_stats,
    token_count,
)
from pipz_spark.datapipe.dedup import lsh_candidate_pairs, minhash_signature
from pipz_spark.datapipe.similarity import cosine_similarity


def test_token_count(documents):
    out = split_ok(token_count()(documents))
    row = out.select("text", "n_tokens", "n_bpe_ish").first()
    assert row["n_tokens"] == len(row["text"].split())
    import math

    expected_bpe = sum(math.ceil(len(t) / 4) for t in row["text"].split())
    assert row["n_bpe_ish"] == expected_bpe


def test_text_stats_and_quality(documents):
    out = split_ok(quality_score()(text_stats()(documents)))
    rows = out.select("n_tokens", "punct_ratio", "quality").collect()
    for r in rows[:20]:
        assert r["n_tokens"] > 0
        assert 0.0 <= r["quality"] <= 1.0
        assert 0.0 <= r["punct_ratio"] <= 1.0


def test_lang_id_deterministic(documents):
    out = split_ok(lang_id()(documents))
    preds = {r["lang_pred"] for r in out.select("lang_pred").distinct().collect()}
    assert preds <= {"en", "de", "fr", "es", "und"}
    # deterministic across two runs
    a = out.orderBy("doc_id").select("lang_pred").collect()
    b = split_ok(lang_id()(documents)).orderBy("doc_id").select("lang_pred").collect()
    assert a == b


def test_fingerprint_matches_python(documents):
    out = split_ok(fingerprint()(documents)).select("text", "fp_roll").first()
    acc = 0
    for ch in out["text"]:
        acc = (acc * 31 + ord(ch)) % 1000000007
    assert out["fp_roll"] == acc


def test_exact_dedup_keeps_min_id(spark, documents):
    dup = documents.limit(5)
    with_dups = documents.unionByName(
        dup.withColumn("doc_id", F.col("doc_id") + 100000)
    )
    out = split_ok(exact_dedup()(with_dups))
    assert out.count() == documents.count()
    # the kept id per duplicated text is the smaller one
    kept = out.join(dup.select("text"), "text").select("doc_id").collect()
    assert all(r["doc_id"] < 100000 for r in kept)


def test_minhash_near_dup_finds_planted_pair(spark, documents):
    # plant a near-duplicate: copy a doc and tweak the tail
    base = documents.limit(1).collect()[0]
    tweaked = base["text"] + " extra tail token"
    planted = spark.createDataFrame(
        [(999999, tweaked, base["lang"], base["source"], len(tweaked))],
        schema=documents.schema,
    )
    corpus = documents.unionByName(planted)
    pairs = near_dup_pairs(corpus, threshold=0.7)
    hits = pairs.where(
        (F.col("id_a") == base["doc_id"]) & (F.col("id_b") == 999999)
    ).collect()
    assert len(hits) == 1
    assert hits[0]["jaccard"] >= 0.7


def test_jaccard_ngram_finds_planted_pair(spark, documents):
    from pipz_spark.datapipe import jaccard_near_dup_pairs

    base = documents.limit(1).collect()[0]
    tweaked = base["text"] + " extra tail token"
    planted = spark.createDataFrame(
        [(999999, tweaked, base["lang"], base["source"], len(tweaked))],
        schema=documents.schema,
    )
    corpus = documents.unionByName(planted)
    pairs = jaccard_near_dup_pairs(corpus, threshold=0.5)
    hits = pairs.where(
        (F.col("id_a") == base["doc_id"]) & (F.col("id_b") == 999999)
    ).collect()
    assert len(hits) == 1
    assert hits[0]["jaccard"] >= 0.5


def test_jaccard_ngram_df_cap_prunes_boilerplate(spark):
    from pipz_spark.datapipe import jaccard_near_dup_pairs

    # 40 docs sharing ONE boilerplate 5-gram header but otherwise
    # unique (each unique tail is longer than the shared header, so
    # true Jaccard is low) + one planted near-identical pair. With
    # the cap below 40, the boilerplate gram generates no candidates;
    # the planted pair still surfaces through its unique shared grams.
    header = "lorem ipsum dolor sit amet"
    rows = [
        (i, f"{header} unique{i} a{i} b{i} c{i} d{i} e{i} f{i} g{i}")
        for i in range(40)
    ]
    rows.append((100, "the quick brown fox jumps over the lazy dog today"))
    rows.append((101, "the quick brown fox jumps over the lazy dog tonight"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = jaccard_near_dup_pairs(
        docs, threshold=0.5, n=5, max_doc_freq=8
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(100, 101)]


def test_jaccard_ngram_no_cartesian(documents):
    from pipz_spark.datapipe import jaccard_near_dup_pairs

    plan = (
        jaccard_near_dup_pairs(documents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_no_cartesian_product(documents):
    pairs = lsh_candidate_pairs(documents)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_signature_shape(documents):
    out = minhash_signature(num_hashes=16)(documents)
    row = split_ok(out).select("minhash").first()
    assert len(row["minhash"]) == 16


def test_simhash_near_dups(spark, documents):
    base = documents.limit(1).collect()[0]
    # identical text → hamming 0
    planted = spark.createDataFrame(
        [(999999, base["text"], base["lang"], base["source"], base["n_chars"])],
        schema=documents.schema,
    )
    corpus = documents.unionByName(planted)
    pairs = simhash_near_dup_pairs(corpus, max_hamming=0)
    hit = pairs.where((F.col("id_a") == base["doc_id"]) & (F.col("id_b") == 999999))
    assert hit.count() == 1
    out = split_ok(simhash()(documents))
    assert out.select("simhash").first()["simhash"] >= 0


def test_simhash_hot_bucket_exhaustive(spark):
    # A template cluster far above max_bucket, plus small-edit
    # variants: the r3 cap silently DROPPED every pair in oversized
    # buckets (ADVICE: recall hole); the size-routed plan must keep
    # pigeonhole recall at exactly 1 — verified against a brute-force
    # hamming computation over the same signatures.
    from pipz_spark.datapipe.dedup import simhash_df

    rows = [(i, "same boilerplate text repeated everywhere") for i in range(100)]
    rows += [
        (1000 + i, f"same boilerplate text repeated everywhere extra{i}")
        for i in range(4)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = simhash_near_dup_pairs(docs, max_hamming=3, max_bucket=16)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    sigs = {r["_id"]: r["_h"] for r in simhash_df(docs).collect()}
    want = {
        (a, b)
        for a in sigs
        for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    assert got == want
    assert len(want) >= 100 * 99 // 2  # the hot cluster itself survives
    # distinct texts below the cap still pair up
    small = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    assert simhash_near_dup_pairs(small, max_hamming=0).count() == 1


def test_simhash_md5_hash_portable(spark):
    # md5_60 base hash: same text → same signature regardless of
    # engine; sanity-check it yields identical pair sets to itself
    # and non-negative 60-bit signatures
    from pipz_spark.datapipe.dedup import simhash_df

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y z")], "doc_id long, text string"
    )
    sigs = {r["_id"]: r["_h"] for r in simhash_df(docs, hash_fn="md5_60").collect()}
    assert sigs[1] == sigs[2] != sigs[3]
    assert all(0 <= s < (1 << 60) for s in sigs.values())


def test_cosine_topk_bruteforce_exact(spark, embeddings):
    queries = embeddings.where(F.col("vec_id") < 3)
    out = cosine_topk_bruteforce(embeddings, queries, k=5)
    rows = out.collect()
    assert len(rows) == 15
    # cross-check one query against numpy
    import numpy as np

    emb = {r["vec_id"]: np.array(r["embedding"], dtype="float64") for r in embeddings.collect()}
    q = emb[0]
    sims = {
        i: float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)))
        for i, v in emb.items()
        if i != 0
    }
    expect = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = sorted([(r["nid"], r["cos"]) for r in rows if r["qid"] == 0], key=lambda x: -x[1])
    assert [n for n, _ in expect] == [n for n, _ in got]
    for (_, e), (_, g) in zip(expect, got):
        assert abs(e - g) < 1e-4


def test_cosine_topk_lsh_shape_and_no_cartesian(embeddings):
    queries = embeddings.where(F.col("vec_id") < 5)
    out = cosine_topk_lsh(embeddings, queries, k=3, bits=6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    rows = out.collect()
    assert len(rows) <= 15
    assert all(r["cos"] <= 1.000001 for r in rows)


def test_multimodal_blob_roundtrip(documents):
    out = split_ok(blob_metadata()(attach_blob()(documents)))
    r = out.select("text", "n_bytes", "sha", "blob_meta").first()
    assert r["n_bytes"] == len(r["text"].encode("utf-8"))
    assert r["sha"] == r["blob_meta"]["sha"]


def test_decode_image_features_stub(documents):
    blobs = split_ok(attach_blob()(documents))
    feats = decode_image_features(blobs)
    r = feats.join(blobs.select("doc_id", "text"), "doc_id").first()
    payload = r["text"].encode("utf-8")
    assert r["n_bytes"] == len(payload)
    assert abs(r["mean_byte"] - round(sum(payload) / len(payload), 4)) < 1e-9


def test_decode_image_features_pil_path(spark):
    # skip-gated like the protobuf state-v2 twin: runs wherever
    # Pillow is installed, silently skips here. Same output schema as
    # the bytes mode; mean_byte becomes the mean pixel of the decoded
    # grayscale 32×32 image, and a non-image payload falls back to
    # byte stats instead of failing the scan.
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    from pipz_spark.datapipe import decode_image_features

    buf = io.BytesIO()
    Image.new("L", (8, 8), color=120).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"not an image"))],
        "doc_id long, blob binary",
    )
    rows = {r["doc_id"]: r for r in decode_image_features(df, mode="pil").collect()}
    assert rows[1]["mean_byte"] == 120.0  # constant image → constant pixels
    assert rows[1]["n_bytes"] == len(png)
    payload = b"not an image"
    assert abs(rows[2]["mean_byte"] - round(sum(payload) / len(payload), 4)) < 1e-9


def test_decode_image_features_mode_validation(documents):
    from pipz_spark.datapipe import decode_image_features, pil_available

    blobs = split_ok(attach_blob()(documents.limit(2)))
    with pytest.raises(ValueError):
        decode_image_features(blobs, mode="bogus")
    if not pil_available():
        with pytest.raises(ImportError):
            decode_image_features(blobs, mode="pil")
    # auto always resolves to a runnable mode
    assert decode_image_features(blobs, mode="auto").count() == 2


def test_sample_frames(documents):
    blobs = split_ok(attach_blob()(documents.limit(3)))
    frames = sample_frames(blobs, every_n_bytes=64)
    r = frames.groupBy("doc_id").agg(F.count("*").alias("n"), F.max("offset").alias("mx")).collect()
    src = {x["doc_id"]: len(x["text"].encode()) for x in documents.limit(3).collect()}
    for row in r:
        expected = (src[row["doc_id"]] - 1) // 64 + 1
        assert row["n"] == expected


def test_cosine_topk_lsh_recall(embeddings):
    # multi-table LSH must recover most exact neighbors (defaults
    # tuned on the driver's synthetic embeddings: ~0.9 at sf0.01)
    queries = embeddings.where(F.col("vec_id") < 10)
    exact = {
        (r["qid"], r["nid"]) for r in cosine_topk_bruteforce(embeddings, queries, k=5).collect()
    }
    approx = {
        (r["qid"], r["nid"]) for r in cosine_topk_lsh(embeddings, queries, k=5).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.5


def test_cosine_topk_ivf_recall(embeddings):
    from pipz_spark.datapipe import cosine_topk_ivf

    queries = embeddings.where(F.col("vec_id") < 10)
    exact = {
        (r["qid"], r["nid"]) for r in cosine_topk_bruteforce(embeddings, queries, k=5).collect()
    }
    out = cosine_topk_ivf(embeddings, queries, k=5, nlist=8, nprobe=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # centroids ship in the UDF closure, NEVER as plan literals — at
    # nlist >= 4096 a literal centroid matrix would bloat every plan.
    # The literal form measured ~8 KB of centroid text PER use at
    # nlist=8/dim=64; the closure form keeps the whole plan ~4.6 KB.
    assert "ArrowEvalPython" in plan and len(plan) < 10_000
    approx = {(r["qid"], r["nid"]) for r in out.collect()}
    assert len(exact & approx) / len(exact) >= 0.5


def test_cosine_topk_pq_exact_at_gate_params(embeddings):
    # PQ shortlist + exact rerank must EQUAL brute force when the
    # shortlist holds every true neighbor (the declared-query gate
    # parameters); repeated build must be byte-identical (codebook
    # init, encode argmin, and all tie-breaks are deterministic)
    from pipz_spark.datapipe import cosine_topk_pq

    queries = embeddings.where(F.col("vec_id") < 10)
    exact = sorted(
        map(tuple, cosine_topk_bruteforce(embeddings, queries, k=5).collect())
    )
    pq1 = sorted(
        map(
            tuple,
            cosine_topk_pq(
                embeddings, queries, k=5, m=32, ksub=64, shortlist=128
            ).collect(),
        )
    )
    assert pq1 == exact
    pq2 = sorted(
        map(
            tuple,
            cosine_topk_pq(
                embeddings, queries, k=5, m=32, ksub=64, shortlist=128
            ).collect(),
        )
    )
    assert pq2 == pq1


def test_cosine_topk_pq_shortlist_prunes_and_rejects_bad_params(embeddings):
    from pipz_spark.datapipe import cosine_topk_pq

    queries = embeddings.where(F.col("vec_id") < 3)
    # a tight shortlist is the production shape: still k results per
    # query, plan free of cartesian products
    out = cosine_topk_pq(embeddings, queries, k=3, m=16, ksub=16, shortlist=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    counts = {r["qid"]: r["n"] for r in out.groupBy("qid").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {0, 1, 2} and all(v == 3 for v in counts.values())
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cosine_topk_pq(embeddings, queries, m=7)  # 64 % 7 != 0
    with _pytest.raises(ValueError):
        cosine_topk_pq(embeddings, queries, ksub=1)


def test_cosine_topk_pq_empty_queries_degrades_to_empty(embeddings):
    # the bruteforce/LSH/IVF siblings yield zero rows naturally via
    # their joins; PQ's driver-side LUT build crashed in numpy before
    # any Spark job on a (0,) query matrix (r6 advisor) — it must
    # short-circuit to an empty frame with the standard schema
    from pipz_spark.datapipe import cosine_topk_pq

    out = cosine_topk_pq(
        embeddings, embeddings.where(F.col("vec_id") < 0), k=3, m=16, ksub=16
    )
    assert out.columns == ["qid", "nid", "cos", "rank"]
    assert out.count() == 0


def test_ann_string_ids_and_cache_release(spark, embeddings):
    # the in-bucket scorers must preserve non-integer id types (their
    # applyInPandas schemas are derived, not hardcoded)...
    from pipz_spark.datapipe import cosine_topk_lsh, near_dup_pairs, release_caches

    emb = embeddings.select(
        F.concat(F.lit("v"), F.col("vec_id")).alias("vec_id"), "embedding"
    )
    out = cosine_topk_lsh(emb, emb.limit(3), k=2, bits=2, tables=8)
    rows = out.collect()
    assert rows and all(r["qid"].startswith("v") and r["nid"].startswith("v") for r in rows)
    # ...and release_caches must actually free the pinned frames (a
    # weakref registry silently released nothing — r4 review)
    release_caches()
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    near_dup_pairs(docs, threshold=0.5).count()
    assert release_caches() > 0


def test_embedding_near_dup_pairs(spark, embeddings):
    from pipz_spark.datapipe import embedding_near_dup_pairs

    # plant an exact duplicate vector under a new id
    base = embeddings.limit(1).collect()[0]
    planted = spark.createDataFrame(
        [(999999, base["embedding"], base["label"])], schema=embeddings.schema
    )
    corpus = embeddings.unionByName(planted)
    pairs = embedding_near_dup_pairs(corpus, threshold=0.99)
    hit = pairs.where((F.col("id_a") == base["vec_id"]) & (F.col("id_b") == 999999))
    got = hit.collect()
    assert len(got) == 1
    assert got[0]["cos"] >= 0.999999


def test_deterministic_split_stability(documents):
    from pipz_spark.datapipe import deterministic_split

    step = deterministic_split("tvt", "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    a = {r["doc_id"]: r["split"] for r in split_ok(step(documents)).collect()}
    # same assignment on a repartitioned copy (randomSplit would differ)
    b = {
        r["doc_id"]: r["split"]
        for r in split_ok(step(documents.repartition(7))).collect()
    }
    assert a == b
    counts = {}
    for v in a.values():
        counts[v] = counts.get(v, 0) + 1
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_approx_profile_tracks_exact(spark, documents):
    from pipz_spark.datapipe import approx_dataset_profile

    row = split_ok(
        approx_dataset_profile(
            "ap", distinct_cols=["doc_id", "lang"], quantile_cols=["n_chars"]
        )(documents)
    ).first()
    exact_ids = documents.select("doc_id").distinct().count()
    exact_langs = documents.select("lang").distinct().count()
    assert row["n_rows"] == documents.count()
    # HLL++ at rsd=0.05: allow 4 sigma
    assert abs(row["doc_id_approx_distinct"] - exact_ids) <= max(4, 0.2 * exact_ids)
    # tiny cardinalities are exact in the HLL sparse regime
    assert row["lang_approx_distinct"] == exact_langs
    q50, q90, q99 = row["n_chars_approx_quantiles"]
    lo, hi = documents.selectExpr("min(n_chars)", "max(n_chars)").first()
    assert lo <= q50 <= q90 <= q99 <= hi
    # the sketch plan must be a plain two-phase hash aggregate: one
    # scan, partial_approx_* map-side, NO expand/sort (the exact
    # count-distinct shape this operator exists to avoid)
    plan = (
        split_ok(approx_dataset_profile("ap2", distinct_cols=["doc_id"])(documents))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_approx_count_distinct" in plan
    assert "Expand" not in plan and "Sort" not in plan


def test_deterministic_sample_nesting(documents):
    from pipz_spark.datapipe import deterministic_sample

    small = {r["doc_id"] for r in split_ok(deterministic_sample("s", "doc_id", 0.1)(documents)).collect()}
    big = {r["doc_id"] for r in split_ok(deterministic_sample("s", "doc_id", 0.3)(documents)).collect()}
    assert small <= big  # nested samples
    assert 0 < len(small) < len(big) < documents.count()


def test_stratified_sample(documents):
    from pipz_spark.datapipe import stratified_sample

    step = stratified_sample(
        "by-lang", "doc_id", ["lang"], {"en": 0.1}, default_fraction=1.0
    )
    out = split_ok(step(documents))
    n_en_all = documents.where("lang = 'en'").count()
    n_en_kept = out.where("lang = 'en'").count()
    n_other_all = documents.where("lang <> 'en'").count()
    n_other_kept = out.where("lang <> 'en'").count()
    assert n_other_kept == n_other_all  # non-en fully kept
    assert n_en_kept < n_en_all * 0.3  # en sampled down


def test_cross_near_dup_sides_never_pair_within(spark):
    from pipz_spark.datapipe import cross_near_dup_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # ids COLLIDE across corpora on purpose: new#1 and ref#1 are
    # different documents — a naive union of sides would conflate them
    new = spark.createDataFrame(
        [(1, base), (2, "totally different content here nothing shared")],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(1, "unrelated reference text entirely"), (7, base), (8, base + " tail")],
        "doc_id long, text string",
    )
    out = cross_near_dup_pairs(new, ref, threshold=0.7).collect()
    pairs = {(r["new_id"], r["ref_id"]) for r in out}
    # new#1 duplicates ref#7 (identical) and ref#8 (near); nothing
    # pairs new#1 with ref#1 despite the id collision, and no
    # within-side pair (7,8) can appear by construction
    assert (1, 7) in pairs
    assert (1, 1) not in pairs
    assert all(r["jaccard"] >= 0.7 for r in out)
    ids_new = {p[0] for p in pairs}
    assert 2 not in ids_new  # dissimilar new doc untouched


def test_cross_bucket_pairs_salted_branch_exhaustive(spark):
    # a viral bucket far above max_bucket must produce the EXACT full
    # cross product through the salted grid join — the deterministic
    # split exists because AQE cannot see output-side skew; recall
    # must never pay for it
    from pipz_spark.datapipe.dedup import _cross_bucket_pairs
    from pipz_spark.datapipe import release_caches

    nb = spark.range(30).select(
        F.lit(1).alias("k"), F.col("id").alias("new_id")
    )
    rb = spark.range(40).select(
        F.lit(1).alias("k"), (F.col("id") + 1000).alias("ref_id")
    )
    out = _cross_bucket_pairs(nb, rb, ["k"], max_bucket=8)
    assert out.count() == 30 * 40
    assert out.distinct().count() == 30 * 40
    # and the plain-join fast path gives the same answer
    fast = _cross_bucket_pairs(nb, rb, ["k"], max_bucket=64)
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, out.collect()))
    release_caches()


def test_cross_near_dup_precomputed_index_equivalent(spark, tmp_path):
    # the production shape: band the reference corpus ONCE, persist,
    # and dedup batches against the stored index — results must equal
    # the direct two-sided call
    from pipz_spark.datapipe import cross_near_dup_pairs
    from pipz_spark.datapipe.dedup import minhash_signatures_df

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ref = spark.createDataFrame(
        [(7, base), (8, base + " tail"), (9, "noise words only here")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame([(1, base)], "doc_id long, text string")
    idx_path = str(tmp_path / "ref_sigs")
    # the stored index is the compact signature frame; num_hashes must
    # match the batch-side family
    minhash_signatures_df(ref, num_hashes=120).write.mode("overwrite").parquet(idx_path)
    idx = spark.read.parquet(idx_path)
    direct = sorted(map(tuple, cross_near_dup_pairs(new, ref, threshold=0.7).collect()))
    via_idx = sorted(
        map(
            tuple,
            cross_near_dup_pairs(new, ref, threshold=0.7, ref_sigs=idx).collect(),
        )
    )
    assert via_idx == direct and direct


def test_temperature_resample_flattens_mixture(documents):
    from pipz_spark.datapipe import temperature_resample

    step = temperature_resample("flatten", "doc_id", "lang", 0.5, alpha=0.5)
    out = split_ok(step(documents))
    all_counts = {r["lang"]: r["n"] for r in documents.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept_counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # rare strata keep a HIGHER fraction than common ones (that is the
    # flattening), and the overall size lands near the 50% target
    rates = {s: kept_counts.get(s, 0) / n for s, n in all_counts.items()}
    common = max(all_counts, key=all_counts.get)
    rare = min(all_counts, key=all_counts.get)
    assert rates[rare] > rates[common]
    total_kept = sum(kept_counts.values())
    assert 0.4 <= total_kept / sum(all_counts.values()) <= 0.6
    # deterministic: same membership on a re-run
    ids1 = {r["doc_id"] for r in out.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in split_ok(step(documents)).select("doc_id").collect()}
    assert ids1 == ids2


def test_temperature_resample_rejects_bad_fraction(spark):
    from pipz_spark.datapipe import temperature_resample

    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_resample("t", "doc_id", "lang", 0.0)
    with _pytest.raises(ValueError):
        temperature_resample("t", "doc_id", "lang", 1.5)


def test_regex_token_count(documents):
    from pipz_spark.datapipe import regex_token_count

    import re

    out = split_ok(regex_token_count()(documents))
    r = out.join(documents.select("doc_id", "text"), "doc_id").first()
    assert r["n_word_tokens"] == len(re.findall(r"[^\W\d_]+", r["text"]))
    assert r["n_regex_tokens"] == (
        r["n_word_tokens"] + r["n_number_tokens"] + r["n_symbol_tokens"]
    )


def test_lm_quality_scores(spark, documents):
    from pipz_spark.datapipe import lm_quality_scores

    scores = lm_quality_scores(documents)
    rows = scores.collect()
    assert len(rows) == documents.count()
    assert all(r["lm_logp"] < 0 for r in rows)
    # verify one doc against a pure-python reference LM
    import math
    from collections import Counter

    texts = {r["doc_id"]: r["text"].lower() for r in documents.collect()}
    bi, uni = Counter(), Counter()
    for t in texts.values():
        for i in range(len(t) - 1):
            bi[t[i : i + 2]] += 1
            uni[t[i]] += 1
    vocab = len(uni) + 1
    doc_id, text = next(iter(texts.items()))
    logps = [
        math.log((bi[text[i : i + 2]] + 1) / (uni[text[i]] + vocab))
        for i in range(len(text) - 1)
    ]
    expected = round(sum(logps) / len(logps), 4)
    got = scores.where(F.col("doc_id") == doc_id).first()["lm_logp"]
    assert abs(got - expected) < 2e-4
    # gibberish scores far lower than corpus text
    gib = spark.createDataFrame(
        [(999999, "zqxjkw vbxqzj wqkxzv jzxqwk", "en", "src0", 27)],
        schema=documents.schema,
    )
    from pipz_spark.datapipe import fit_bigram_lm, score_bigram_lm

    lm = fit_bigram_lm(documents)
    gib_score = score_bigram_lm(gib, lm).first()["lm_logp"]
    median_real = sorted(r["lm_logp"] for r in rows)[len(rows) // 2]
    assert gib_score < median_real - 1.0


def test_split_single_label_and_null_keys(spark, documents):
    from pipz_spark.datapipe import deterministic_sample, deterministic_split

    one = deterministic_split("all", "doc_id", {"train": 1.0})(documents)
    assert split_ok(one).where("split <> 'train'").count() == 0
    # NULL keys bucket deterministically — never silently dropped
    with_null = documents.limit(5).withColumn(
        "doc_id", F.when(F.col("doc_id") == 0, F.lit(None)).otherwise(F.col("doc_id"))
    )
    sampled = split_ok(deterministic_sample("s", "doc_id", 1.0)(with_null))
    assert sampled.count() == 5  # fraction 1.0 keeps everything incl. NULL key


def test_lm_scores_keep_short_docs(spark, documents):
    from pipz_spark.datapipe import fit_bigram_lm, score_bigram_lm

    short = spark.createDataFrame(
        [(777777, "x", "en", "s", 1)], schema=documents.schema
    )
    corpus = documents.unionByName(short)
    lm = fit_bigram_lm(documents)
    scores = score_bigram_lm(corpus, lm)
    assert scores.count() == corpus.count()
    r = scores.where(F.col("doc_id") == 777777).first()
    assert r["n_bigrams"] == 0 and r["lm_logp"] is None


def test_fan_out_rebalances_only_when_under_partitioned(spark, tmp_path):
    # a one-split SCAN must spread across the cluster before a
    # CPU-bound stage; a frame whose plan already sets its own
    # partitioning (caller repartition/coalesce, upstream shuffle)
    # must pass through untouched — second-guessing a chosen layout
    # with another shuffle is never fan_out's call
    from pipz_spark.datapipe._util import fan_out

    par = spark.sparkContext.defaultParallelism
    # real single-file scan (the case fan_out exists for)
    spark.range(1000).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "one"))
    narrow = spark.read.parquet(str(tmp_path / "one"))
    assert narrow.rdd.getNumPartitions() == 1
    assert fan_out(narrow).rdd.getNumPartitions() == par
    # explicitly partitioned frames are respected, even below target
    chosen = spark.range(1000).coalesce(1)
    assert fan_out(chosen) is chosen
    wide = spark.range(1000).repartition(par + 4)
    out = fan_out(wide)
    assert out.rdd.getNumPartitions() == par + 4
    assert out is wide  # no-op, not a new plan


def test_bucket_pairs_small_only_skips_big_branch(spark):
    # when no bucket exceeds the cap the big-branch self-join must
    # not appear in the plan (r4: the always-empty branch cost +23-34%
    # on the minhash/simhash suite queries)
    from pipz_spark.datapipe.dedup import _bucket_pairs

    rows = [(b, 0, 10 * b + i) for b in range(3) for i in range(4)]
    bucketed = spark.createDataFrame(rows, "band long, band_hash long, _id long")
    pairs = _bucket_pairs(bucketed, ["band", "band_hash"], max_bucket=16)
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    assert pairs.count() == 3 * 6  # 3 buckets x C(4,2), exhaustive


def test_deterministic_shuffle_stable_and_contiguous(spark, documents):
    # the export-order contract: (shard, shuffle_rank) is a pure
    # function of (key, salt) — identical across runs AND input
    # partitionings — and ranks are contiguous 1..|shard| so shard
    # files replay as a gapless stream
    from pipz_spark.datapipe import deterministic_shuffle

    a = {
        r["doc_id"]: (r["shard"], r["shuffle_rank"])
        for r in deterministic_shuffle(documents, n_shards=8).collect()
    }
    b = {
        r["doc_id"]: (r["shard"], r["shuffle_rank"])
        for r in deterministic_shuffle(documents.repartition(13), n_shards=8).collect()
    }
    assert a == b and len(a) == documents.count()
    assert all(0 <= s < 8 for s, _ in a.values())
    from collections import Counter

    per_shard = Counter(s for s, _ in a.values())
    ranks = {}
    for s, r in a.values():
        ranks.setdefault(s, set()).add(r)
    for s, n in per_shard.items():
        assert ranks[s] == set(range(1, n + 1)), f"shard {s} ranks not contiguous"
    # a different salt produces a different order (same membership)
    c = {
        r["doc_id"]: (r["shard"], r["shuffle_rank"])
        for r in deterministic_shuffle(documents, n_shards=8, salt="other").collect()
    }
    assert set(c) == set(a) and c != a
    import pytest as _pytest

    with _pytest.raises(ValueError):
        deterministic_shuffle(documents, n_shards=0)
    # r7 advisory: reserved output names must refuse, not clobber
    with _pytest.raises(ValueError, match="shard"):
        deterministic_shuffle(documents.withColumn("shard", F.lit(1)))
    with _pytest.raises(ValueError, match="_h"):
        deterministic_shuffle(documents.withColumn("_h", F.lit("x")))


def test_write_shuffled_export_replays_rank_order(spark, documents, tmp_path):
    # the durable half of the shuffle contract: reading a shard
    # directory top-to-bottom must yield exactly the rank order the
    # shuffle assigned (parquet preserves in-file row order; the sink
    # sorts within partitions before the partitioned write)
    from pipz_spark.datapipe import deterministic_shuffle
    from pipz_spark.sources import write_shuffled_export

    path = str(tmp_path / "export")
    write_shuffled_export(documents, path, n_shards=4)
    expected = {
        r["doc_id"]: (r["shard"], r["shuffle_rank"])
        for r in deterministic_shuffle(documents, n_shards=4).collect()
    }
    for shard in range(4):
        got = [
            r["doc_id"]
            for r in spark.read.parquet(f"{path}/shard={shard}").collect()
        ]
        want = sorted(
            (k for k, (s, _) in expected.items() if s == shard),
            key=lambda k: expected[k][1],
        )
        assert got == want, f"shard {shard} order diverged"
    # partition pruning: a shard filter reads ONE directory
    pruned = spark.read.parquet(path).where(F.col("shard") == 2)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan


def test_connected_components_chain_and_clique(spark):
    # chain 1-2-3-4-5 (diameter 4: forces multi-round propagation),
    # triangle 10-11-12, isolated pair 20-21
    from pipz_spark.datapipe import connected_components

    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_null_pairs_dropped_uniformly(spark):
    # NULL-endpoint pairs are dropped wholesale BEFORE any path runs
    # (r15 review fix — previously the label path emitted
    # (NULL → min neighbor) while star contraction emitted
    # (NULL → NULL), so an auto escalation silently changed the
    # mapping): every algorithm and the driver fast path must see
    # the same graph, and nodes whose only pairs had a NULL partner
    # are absent from the map
    from pipz_spark.datapipe import connected_components

    edges = [(1, 2), (2, 3), (None, 7), (8, None)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    results = {
        mode: {
            r["node"]: r["component"]
            for r in connected_components(pairs, **kw).collect()
        }
        for mode, kw in {
            "fastpath": {},
            "label": {"driver_cap": 0, "algorithm": "label"},
            "star": {"driver_cap": 0, "algorithm": "star"},
            "auto-dist": {"driver_cap": 0},
        }.items()
    }
    want = {1: 1, 2: 1, 3: 1}
    for mode, got in results.items():
        assert got == want, mode


def test_line_dedup_delimiter_mode(spark):
    # line_delim: split on the LITERAL delimiter, trim each piece,
    # drop empties, rejoin survivors with the same delimiter
    from pipz_spark.datapipe import line_dedup

    docs = [
        (1, "nav bar\nunique one\n\n  "),   # empty + blank pieces drop
        (2, "nav bar\nunique two"),          # "nav bar" dup → doc 1 wins
        (3, "nav bar"),                      # tombstone
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
        for r in line_dedup(df, line_delim="\n").collect()
    }
    assert out == {
        1: ("nav bar\nunique one", 2, 0),
        2: ("unique two", 1, 1),
        3: ("", 0, 1),
    }


def test_dedup_clusters_keeper_and_singletons(spark):
    from pipz_spark.datapipe import dedup_clusters

    docs = spark.createDataFrame([(i, "t") for i in range(6)], "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a long, id_b long")
    rows = {
        r["doc_id"]: (r["cluster_id"], r["is_keeper"])
        for r in dedup_clusters(docs, pairs=pairs).collect()
    }
    # {0,3,5} one cluster kept by 0; 1,2,4 singletons keep themselves
    assert rows == {0: (0, True), 3: (0, False), 5: (0, False),
                    1: (1, True), 2: (2, True), 4: (4, True)}


def test_connected_components_raises_when_unconverged(spark):
    # algorithm='label': a chain longer than max_iter propagation
    # rounds must FAIL, not silently return a split cluster (multiple
    # "keepers" per true duplicate group = train/test leakage)
    import pytest as _pytest

    from pipz_spark.datapipe import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2, algorithm="label")
    # and with enough rounds the same chain resolves to one component
    got = connected_components(chain, max_iter=10, algorithm="label").collect()
    assert {r["component"] for r in got} == {0}
    with _pytest.raises(ValueError):
        connected_components(chain, algorithm="bogus")


def test_connected_components_auto_escalates_long_chain(spark):
    # the r6 judge ask: a 1000-node path graph (the crawl-mirror
    # chain shape the docstring names as the 100 TB adversarial case)
    # has diameter ≫ max_iter — 'auto' must escalate to large-star/
    # small-star contraction and converge instead of raising
    from pipz_spark.datapipe import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(999)], "id_a long, id_b long"
    )
    # driver_cap=0 forces the distributed machinery — the default
    # would resolve this 999-edge graph on the driver and never reach
    # the escalation under test
    got = {
        r["node"]: r["component"]
        for r in connected_components(chain, max_iter=3, driver_cap=0).collect()
    }
    assert len(got) == 1000
    assert set(got.values()) == {0}
    # and the driver fast path (cap above the edge count) agrees
    via_driver = {
        r["node"]: r["component"]
        for r in connected_components(chain, max_iter=3).collect()
    }
    assert via_driver == got


def test_star_contraction_preserves_self_loop_nodes(spark):
    # node-universe parity: a node whose only pair is a self-loop is
    # a singleton in the label path's output; the star path filters
    # self-edges from its canonical frame, so it must re-emit such
    # nodes or an auto-escalation silently shrinks the map
    # (r7 review finding)
    from pipz_spark.datapipe import connected_components

    pairs = spark.createDataFrame([(7, 7), (1, 2)], "id_a long, id_b long")
    expected = {7: 7, 1: 1, 2: 1}
    for algo in ("label", "star"):
        got = {
            r["node"]: r["component"]
            for r in connected_components(pairs, algorithm=algo).collect()
        }
        assert got == expected, algo


def test_star_contraction_matches_label_propagation_on_random_graphs(spark):
    # property check: on random graphs (mixed chains, cliques,
    # singleton-free scatter) the direct star-contraction path must
    # produce EXACTLY the union-find ground truth, i.e. agree with
    # converged label propagation
    import random

    from pipz_spark.datapipe import connected_components

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n = 60
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(30, 80))
            }
        )
        # union-find ground truth
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        truth = {
            x: find(x)
            for x in range(n)
            if any(x in e for e in edges)
        }
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        star = {
            r["node"]: r["component"]
            for r in connected_components(pairs, algorithm="star").collect()
        }
        assert star == truth, f"seed {seed}"
        # three-way parity: driver union-find (default auto) and
        # distributed label propagation (cap disabled) must agree
        # with the same ground truth
        via_driver = {
            r["node"]: r["component"]
            for r in connected_components(pairs).collect()
        }
        assert via_driver == truth, f"seed {seed} driver"
        via_label = {
            r["node"]: r["component"]
            for r in connected_components(pairs, driver_cap=0).collect()
        }
        assert via_label == truth, f"seed {seed} label"


def test_dedup_clusters_keeper_present_when_min_id_filtered_out(spark):
    # pairs may reference ids absent from df (caller filtered the
    # corpus after pair generation): the keeper must be the min
    # PRESENT id, never an absent one (which would drop the whole
    # group on is_keeper filtering)
    from pipz_spark.datapipe import dedup_clusters

    docs = spark.createDataFrame([(3, "t"), (5, "t")], "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a long, id_b long")
    rows = {r["doc_id"]: (r["cluster_id"], r["is_keeper"])
            for r in dedup_clusters(docs, pairs=pairs).collect()}
    assert rows == {3: (3, True), 5: (3, False)}


def test_chunk_documents_window_semantics(spark):
    from pipz_spark.datapipe import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "a b c"),                    # shorter than one window -> 1 chunk
            (2, " ".join(f"w{i}" for i in range(8))),   # exactly 2 windows (size 4, stride 4 -> no overlap... using stride 3 below)
            (3, ""),                         # empty -> no chunks
            (4, "   "),                      # whitespace-only -> no chunks
            (5, " ".join(f"x{i}" for i in range(10))),
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, size=4, stride=3)
    rows = sorted(
        ((r["doc_id"], r["chunk_id"], r["chunk"], r["n_chunk_tokens"]) for r in out.collect())
    )
    by_doc = {}
    for d, c, ch, n in rows:
        by_doc.setdefault(d, []).append((c, ch, n))
    assert by_doc[1] == [(0, "a b c", 3)]
    assert 3 not in by_doc and 4 not in by_doc
    # doc 5: 10 tokens, starts 0,3,6,9; start 9 adds token x9? window [9,13) covers
    # only x9 — previous window [6,10) already covered it -> dropped
    assert [c for c, _, _ in by_doc[5]] == [0, 1, 2]
    assert by_doc[5][-1] == (2, "x6 x7 x8 x9", 4)
    # every token appears in at least one chunk (coverage invariant)
    covered = set()
    for _, ch, _ in by_doc[5]:
        covered.update(ch.split())
    assert covered == {f"x{i}" for i in range(10)}


def test_chunk_documents_rejects_bad_params(spark):
    import pytest as _pytest

    from pipz_spark.datapipe import chunk_documents

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    for size, stride in ((0, 1), (4, 0), (4, 5)):
        with _pytest.raises(ValueError):
            chunk_documents(docs, size=size, stride=stride)


def test_redact_pii_patterns(spark):
    from pipz_spark import split_ok
    from pipz_spark.datapipe import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.co now"),
            (2, "call 415-555-0100 or 650-555-0199"),
            (3, "host 192.168.1.254 fine"),
            (4, "clean text stays clean"),
            (5, "no-match 1234-555-0100 digitsglued"),  # 4-digit prefix: \b kills it? 1234-555-0100: \d{3}-... matches '234-555-0100'? \b between 1 and 2 fails -> no match
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["text"] for r in split_ok(redact_pii()(docs)).collect()}
    assert got[1] == "mail <EMAIL> now"
    assert got[2] == "call <PHONE> or <PHONE>"
    assert got[3] == "host <IP> fine"
    assert got[4] == "clean text stays clean"
    assert got[5] == "no-match 1234-555-0100 digitsglued"


def test_contamination_counts_shared_ngrams(spark):
    from pipz_spark.datapipe.dedup import contamination

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over dogs"),  # shares 'the quick brown fox' once
            (2, "completely different words entirely here"),
            (3, "the quick brown fox the quick brown fox"),  # duplicate gram counted ONCE
            (4, "tiny doc"),                                  # shorter than n -> whole text one gram
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "benchmark says the quick brown fox runs"), (101, "tiny doc")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_collisions"] for r in contamination(train, eval_df, n=4).collect()}
    assert got == {1: 1, 3: 1, 4: 1}
    # broadcast off takes the shuffled-join path, same answer
    got2 = {
        r["doc_id"]: r["n_collisions"]
        for r in contamination(train, eval_df, n=4, broadcast_eval=False).collect()
    }
    assert got2 == got


def test_ngram_repetition_ratios(spark):
    from pipz_spark.datapipe import ngram_repetition

    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),     # 2-grams: ab ba ab ba -> 4 grams, all repeated
            (2, "x y z w"),       # 3 distinct grams, none repeated
            (3, "solo"),          # shorter than n -> whole text one gram
            (4, ""),              # excluded
            (5, "t t t t"),       # 3 grams of 't t' -> all repeated, top = 1.0
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["rep_fraction"], r["top_fraction"])
        for r in ngram_repetition(docs, n=2).collect()
    }
    assert got[1] == (4, 1.0, 0.5)
    assert got[2] == (3, 0.0, round(1 / 3, 4))
    assert got[3] == (1, 0.0, 1.0)
    assert 4 not in got
    assert got[5] == (3, 1.0, 1.0)


def test_contamination_ignores_blank_docs(spark):
    # the short-doc fallback gram of a blank doc is the empty string;
    # without the blank guard one blank eval doc would flag every
    # blank train doc as contaminated
    from pipz_spark.datapipe import contamination

    train = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real shared benchmark text here")],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "  "), (101, "real shared benchmark text always")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_collisions"] for r in contamination(train, eval_df, n=4).collect()}
    assert got == {3: 1}


def test_pack_sequences_concat_and_chop_invariants(spark):
    from pipz_spark.datapipe import pack_sequences

    chunks = spark.createDataFrame(
        [(d, c, n) for d, c, n in [
            (1, 0, 100), (1, 1, 100), (2, 0, 120), (2, 1, 60), (3, 0, 300),
        ]],
        "doc_id long, chunk_id long, n_chunk_tokens long",
    )
    out = pack_sequences(chunks, budget=256, shards=1).orderBy("doc_id", "chunk_id")
    rows = [(r["doc_id"], r["chunk_id"], r["pack_id"], r["pack_offset"])
            for r in out.collect()]
    # shards=1 -> one global stream in (doc, chunk) order:
    # starts: 0, 100, 200, 320, 380 with budget 256
    assert rows == [
        (1, 0, 0, 0), (1, 1, 0, 100), (2, 0, 0, 200), (2, 1, 1, 64), (3, 0, 1, 124),
    ]
    # invariants: offset < budget always; pack_id nondecreasing in
    # stream order; start == pack_id * budget + offset is the cumsum
    cum = 0
    for _, _, pid, off in rows:
        assert 0 <= off < 256
        assert pid * 256 + off == cum
        cum += {0: 100, 100: 100, 200: 120, 320: 60, 380: 300}[cum]


def test_pack_sequences_sharding_is_deterministic(spark):
    from pipz_spark.datapipe import chunk_documents, pack_sequences
    from pipz_spark.sources.catalog import load_table

    chunks = chunk_documents(load_table(spark, "documents", "/root/testdata/sf0.001"))
    a = pack_sequences(chunks, budget=512, shards=4)
    b = pack_sequences(chunks, budget=512, shards=4)
    assert a.exceptAll(b).count() == 0
    # a doc's chunks never split across shards
    multi = (
        a.groupBy("doc_id")
        .agg(F.count_distinct("shard").alias("ns"))
        .where(F.col("ns") > 1)
    )
    assert multi.count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pack_sequences(chunks, budget=0)


def test_zero_norm_vector_never_wins_topk(spark, embeddings):
    # a zero embedding (padding / failed encoder) used to score
    # cos = 0/0 = NaN in the in-bucket scorers, and NaN sorts above
    # every real double — it outranked every true neighbor (r7 review)
    from pipz_spark.datapipe import cosine_topk_lsh

    base = embeddings.select("vec_id", "embedding")
    zero = spark.createDataFrame(
        [(99999, [0.0] * 64)], "vec_id long, embedding array<float>"
    )
    corpus = base.unionByName(zero)
    out = cosine_topk_lsh(corpus, base.where(F.col("vec_id") < 5), k=3, bits=2)
    rows = out.collect()
    assert rows
    assert all(r["nid"] != 99999 for r in rows if r["rank"] == 1)
    assert all(r["cos"] == r["cos"] for r in rows)  # no NaN survived


def test_exact_dedup_keeps_all_null_id_groups(spark):
    # a content group whose ids are ALL NULL must not vanish — min()
    # skips NULLs and the old null-rejecting join deleted the whole
    # group (r7 review finding)
    from pipz_spark import split_ok
    from pipz_spark.datapipe import exact_dedup

    df = spark.createDataFrame(
        [(None, "unique content"), (1, "dup"), (2, "dup"), (None, "dup")],
        "doc_id int, text string",
    )
    out = split_ok(exact_dedup()(df))
    texts = [(r["doc_id"], r["text"]) for r in out.collect()]
    # null-id unique content survives; the mixed 'dup' group keeps
    # only its smallest NON-NULL keeper
    assert (None, "unique content") in texts
    assert (1, "dup") in texts and (2, "dup") not in texts
    assert (None, "dup") not in texts


def test_banded_signatures_rejects_nondivisible_bands(spark, documents):
    from pipz_spark.datapipe import lsh_candidate_pairs

    with pytest.raises(ValueError, match="divide"):
        lsh_candidate_pairs(documents, num_hashes=100, bands=24).count()


def test_lsh_and_embed_near_dup_degrade_on_empty_corpus(spark, embeddings):
    from pipz_spark.datapipe import cosine_topk_lsh, embedding_near_dup_pairs

    empty = embeddings.where(F.col("vec_id") < 0)
    out = cosine_topk_lsh(empty, embeddings.limit(2), k=3)
    assert out.count() == 0 and out.columns == ["qid", "nid", "cos", "rank"]
    pairs = embedding_near_dup_pairs(empty)
    assert pairs.count() == 0 and pairs.columns == ["id_a", "id_b", "cos"]


def test_decode_image_features_preserves_custom_id(spark):
    # the output schema derives the id name AND type from the input —
    # a hardcoded "doc_id long" renamed custom ids and failed Arrow
    # conversion for string ids (r7 review finding)
    from pipz_spark.datapipe import decode_image_features

    df = spark.createDataFrame(
        [("img-1", bytearray(b"abc"))], "img_id string, blob binary"
    )
    out = decode_image_features(df, id_col="img_id")
    r = out.first()
    assert out.columns[0] == "img_id" and r["img_id"] == "img-1"
    assert r["n_bytes"] == 3


def test_whitespace_class_matches_re2_semantics(spark):
    # Java's \s includes vertical tab; RE2's (DuckDB's) does not. The
    # engine pins the explicit [ \t\n\f\r] class so a VT-bearing doc
    # tokenizes identically under both dialects (r7 review finding):
    # VT is NOT a separator, exactly like the oracle's \s+.
    import duckdb

    from pipz_spark.datapipe import token_count

    df = spark.createDataFrame([(1, "a\x0bb c")], "doc_id long, text string")
    got = split_ok(token_count()(df)).first()["n_tokens"]
    want = duckdb.sql(
        r"SELECT len(string_split_regex(trim('a' || chr(11) || 'b c'), '\s+'))"
    ).fetchone()[0]
    assert got == want == 2  # 'a\x0bb' is ONE token in both engines


def test_bpe_encode_word_canonical_examples():
    # pinned segmentations under the checked-in 40-merge fixture —
    # regenerating the fixture (tools/train_bpe.py) must reproduce them
    from pipz_spark.datapipe.bpe import encode_word, load_merges

    ranks = {p: i for i, p in enumerate(load_merges())}
    assert encode_word("order", ranks) == ("order",)
    assert encode_word("customer", ranks) == ("c", "u", "st", "o", "mer")
    assert encode_word("spark", ranks) == ("s", "par", "k")
    assert encode_word("", ranks) == ()
    assert encode_word("zzz", ranks) == ("z", "z", "z")  # unseen chars stay atomic


def test_bpe_rank_order_equivalence():
    # the oracle's correctness hinge: on a WELL-FORMED merge list,
    # applying merges one at a time in rank order (what the recursive-
    # CTE replace chain does) equals the canonical lowest-rank-first
    # loop. Checked over every word the corpus alphabet can spell, not
    # just corpus words.
    import itertools
    import random

    from pipz_spark.datapipe.bpe import encode_word, load_merges

    merges = load_merges()
    ranks = {p: i for i, p in enumerate(merges)}

    def sequential(word):
        toks = list(word)
        for a, b in merges:  # rank order, one merge rule at a time
            out, i = [], 0
            while i < len(toks):
                if i < len(toks) - 1 and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return tuple(toks)

    rng = random.Random(8)
    alphabet = sorted({c for p in merges for c in (p[0] + p[1])})
    words = ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14))) for _ in range(300)]
    words += ["aaaa", "erer", "stst", "partpart", "windowwindow"]
    for w in words:
        assert encode_word(w, ranks) == sequential(w), w


def test_bpe_token_count_step_skips_errored_rows(spark):
    from pipz_spark.core.errors import ensure_error_column
    from pipz_spark.datapipe import bpe_token_count
    import pipz_spark.operators as P

    df = spark.createDataFrame(
        [(1, "the fast scan"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    bad = P.apply("gate", error_when=F.col("doc_id") == 1, message="x")
    out = bpe_token_count()(bad(ensure_error_column(df)))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_bpe_tokens"] is None  # errored row skipped the step
    assert rows[2]["n_bpe_tokens"] == 0  # NULL text degrades, never fails
    assert rows[3]["n_bpe_tokens"] == 0
    import hashlib

    assert rows[2]["bpe_token_hash"] == hashlib.md5(b"").hexdigest()
    with pytest.raises(ValueError, match="n_bpe_tokens"):
        bpe_token_count()(out)


def test_bpe_tokens_df_matches_reference_counts(spark, documents):
    # n_bpe_tokens through the Spark scan == a driver-local pure-
    # Python encode of the same texts (independent of the SQL oracle)
    from pipz_spark.datapipe import bpe_tokens_df
    from pipz_spark.datapipe.bpe import encode_text, load_merges

    ranks = {p: i for i, p in enumerate(load_merges())}
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_tokens_df(documents).collect()}
    local = {
        r["doc_id"]: len(encode_text(r["text"], ranks))
        for r in documents.select("doc_id", "text").collect()
    }
    assert got == local and len(got) == documents.count()


def test_embedding_index_round_trip_and_family_adoption(spark, embeddings, tmp_path):
    # the index's LSH family rides in schema metadata through a
    # parquet round-trip, and cross_embedding_pairs adopts it — the
    # reloaded-index result must equal the inline-ref result exactly
    from pipz_spark.datapipe import cross_embedding_pairs, embedding_index

    new = embeddings.where(F.col("vec_id") < 20)
    ref = embeddings.where(F.col("vec_id") >= 20)
    inline = {
        (r["new_id"], r["ref_id"], r["cos"])
        for r in cross_embedding_pairs(
            new, ref, threshold=0.3, bits=3, tables=32
        ).collect()
    }
    path = str(tmp_path / "embidx")
    embedding_index(ref, bits=3, tables=32).write.parquet(path)
    reloaded = spark.read.parquet(path)
    meta = reloaded.schema["_sig"].metadata
    assert meta["pipz_lsh_bits"] == 3 and meta["pipz_lsh_tables"] == 32
    via_index = {
        (r["new_id"], r["ref_id"], r["cos"])
        for r in cross_embedding_pairs(
            new, threshold=0.3, ref_index=reloaded
        ).collect()
    }
    assert via_index == inline and len(inline) > 0


def test_cross_embedding_pairs_guards(spark, embeddings):
    from pipz_spark.datapipe import cross_embedding_pairs, embedding_index

    new = embeddings.where(F.col("vec_id") < 5)
    ref = embeddings.where(F.col("vec_id") >= 5)
    idx = embedding_index(ref, bits=3, tables=8)
    # exactly one of ref / ref_index
    with pytest.raises(ValueError, match="exactly one"):
        cross_embedding_pairs(new, ref, ref_index=idx)
    with pytest.raises(ValueError, match="exactly one"):
        cross_embedding_pairs(new)
    # explicit family args that disagree with the stored family raise
    with pytest.raises(ValueError, match="family"):
        cross_embedding_pairs(new, ref_index=idx, bits=5)
    # empty inline reference degrades to an empty result, not a crash
    out = cross_embedding_pairs(new, ref.where(F.col("vec_id") < 0))
    assert out.count() == 0 and out.columns == ["new_id", "ref_id", "cos"]
    # empty index corpus without dim= is an actionable error
    with pytest.raises(ValueError, match="dim"):
        embedding_index(ref.where(F.col("vec_id") < 0))


def test_cross_embedding_pairs_strictly_cross(spark, embeddings):
    # no batch×batch or corpus×corpus pairs can appear, even with an
    # aggressive threshold that would admit them
    from pipz_spark.datapipe import cross_embedding_pairs

    new = embeddings.where(F.col("vec_id") < 30)
    ref = embeddings.where(F.col("vec_id") >= 30)
    rows = cross_embedding_pairs(new, ref, threshold=-1.0, bits=1, tables=4).collect()
    assert len(rows) > 0
    assert all(r["new_id"] < 30 <= r["ref_id"] for r in rows)


def test_bpe_oracle_agrees_on_control_char_text():
    # r8 review: a literal \x02/\x03 in a document must not collide
    # with the oracle's token markers — C0 controls are separators,
    # never tokens, on BOTH engines
    import hashlib

    import duckdb

    from pipz_spark.datapipe.bpe import (
        encode_text,
        load_merges,
        oracle_sql,
    )

    merges = load_merges()
    ranks = {p: i for i, p in enumerate(merges)}
    texts = [
        "the \x02 scan",          # STX byte (the old marker collision)
        "a\x03b \x02\x03 order",  # ETX inside a word position
        "sort\x0bmerge",          # VT: control, so separator now
        "hash-table! #1",         # punctuation + digits stay tokens
        "",                       # empty
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO documents VALUES (?, ?)", [i, t])
    got = {
        r[0]: (r[1], r[2])
        for r in con.sql(oracle_sql(merges)).fetchall()
    }
    for i, t in enumerate(texts):
        toks = encode_text(t, ranks)
        want = (len(toks), hashlib.md5("\x01".join(toks).encode()).hexdigest())
        assert got[i] == want, (t, got[i], want)


def test_bpe_merges_parsing_rules(tmp_path):
    # only #version lines are comments — '#' is a legitimate token,
    # so a trained '# #' merge must load, not vanish (r8 review);
    # zero merges must still yield a runnable (per-char) oracle
    import duckdb

    from pipz_spark.datapipe.bpe import encode_word, load_merges, oracle_sql

    p = tmp_path / "m.txt"
    p.write_text("#version: test\n# #\na b\n")
    merges = load_merges(str(p))
    assert merges == (("#", "#"), ("a", "b"))
    ranks = {m: i for i, m in enumerate(merges)}
    assert encode_word("##", ranks) == ("##",)
    empty = tmp_path / "empty.txt"
    empty.write_text("#version: test\n")
    sql = oracle_sql(load_merges(str(empty)))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (1, 'ab c')")
    assert con.sql(sql).fetchall()[0][1] == 3  # per-character tokens


def test_token_budget_cap_grouped_and_properties(spark, documents):
    from pipz_spark.datapipe import token_budget_cap, token_count

    counted = token_count()(documents)
    # grouped: every lang's kept set must respect its own budget and
    # be the hash-order prefix of that lang's docs
    out = split_ok(token_budget_cap("cap", 3000, group_by=["lang"])(counted))
    rows = out.select("lang", "doc_id", "n_tokens", "token_cumsum").collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert by_lang
    for lang, rs in by_lang.items():
        assert max(r["token_cumsum"] for r in rs) <= 3000
        # inclusive cumsum consistency: sum of kept tokens == max cum
        assert sum(r["n_tokens"] for r in rs) == max(r["token_cumsum"] for r in rs)
    # nesting: a larger budget only ever ADDS documents
    small = {
        r["doc_id"]
        for r in split_ok(token_budget_cap("c1", 2000)(counted)).collect()
    }
    large = {
        r["doc_id"]
        for r in split_ok(token_budget_cap("c2", 8000)(counted)).collect()
    }
    assert small < large
    # errored rows pass through untouched and consume no budget
    from pipz_spark import P

    gated = P.apply("g", error_when=F.col("doc_id") < 5, message="x")(counted)
    capped = token_budget_cap("c3", 2000)(gated)
    from pipz_spark.core.errors import split_failed

    assert split_failed(capped).count() == split_failed(gated).count()
    ok_ids = {r["doc_id"] for r in split_ok(capped).collect()}
    assert all(d >= 5 for d in ok_ids)  # no errored id leaks into ok
    # errored rows consume no budget: capping with errored rows in
    # the stream equals capping the clean subset directly
    direct = {
        r["doc_id"]
        for r in split_ok(
            token_budget_cap("c4", 2000)(counted.where(F.col("doc_id") >= 5))
        ).collect()
    }
    assert ok_ids == direct
    with pytest.raises(ValueError, match="token_cumsum"):
        token_budget_cap("c5", 100)(capped)
    with pytest.raises(ValueError, match="budget"):
        token_budget_cap("c6", -1)


def test_mixture_resample_semantics(spark, documents):
    from pipz_spark.datapipe import mixture_resample, token_count

    counted = token_count()(documents)
    # en dominates the corpus; prescribing a rare-lang-heavy mixture
    # must downsample en hard and keep the binding stratum whole
    shares = {"en": 0.2, "de": 0.4, "fr": 0.4}
    out = split_ok(
        mixture_resample("mix", "doc_id", "lang", shares, token_col="n_tokens")(
            counted
        )
    )
    rows = out.select("lang", "n_tokens").collect()
    langs = {r["lang"] for r in rows}
    assert langs <= {"en", "de", "fr"}  # es/zh (share 0) dropped
    kept = {}
    for r in rows:
        kept[r["lang"]] = kept.get(r["lang"], 0) + r["n_tokens"]
    total_in = {
        r["lang"]: r["t"]
        for r in split_ok(counted)
        .groupBy("lang")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    # the binding stratum (max mass_s/share_s ... min ratio) keeps ~all
    binding = min(shares, key=lambda s: total_in[s] / shares[s])
    assert kept[binding] == total_in[binding]
    # realized token shares near the prescribed mixture (binomial
    # noise of hash membership; corpus is small so the band is wide)
    tot_kept = sum(kept.values())
    for lang, share in shares.items():
        assert abs(kept.get(lang, 0) / tot_kept - share) < 0.12, (lang, kept)
    # validation
    with pytest.raises(ValueError, match="non-empty"):
        mixture_resample("m", "doc_id", "lang", {})
    with pytest.raises(ValueError, match="positive"):
        mixture_resample("m", "doc_id", "lang", {"en": 0.0})


def test_repeated_spans_matches_bruteforce(spark):
    # planted corpus: a shared 30-char block across two docs, a
    # within-doc repeat, and unique filler — spans must equal a
    # brute-force python reference of the same definition
    from pipz_spark.datapipe import repeated_spans

    shared = "the quick brown fox jumps overx"[:30]
    docs = {
        1: f"aaa {shared} unique tail one xxxxxxxx",
        2: f"some other opening text {shared} zzz",
        3: "repeat-block-here!! and repeat-block-here!! again",
        4: "entirely unique text with nothing shared at all ok",
    }
    k = 20
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in repeated_spans(df, min_len=k).collect()
    }

    from collections import Counter

    freq = Counter()
    for t in docs.values():
        for p in range(len(t) - k + 1):
            freq[t[p : p + k]] += 1
    want = set()
    for d, t in docs.items():
        covered = sorted(
            p for p in range(len(t) - k + 1) if freq[t[p : p + k]] >= 2
        )
        spans, cur = [], None
        for p in covered:  # 1-based interval [p+1, p+k]; merge iff
            if cur is not None and p + 1 <= cur[1] + 1:  # overlap/adjacent
                cur = (cur[0], max(cur[1], p + k))
            else:
                if cur:
                    spans.append(cur)
                cur = (p + 1, p + k)
        if cur:
            spans.append(cur)
        for s, e in spans:
            want.add((d, s, e))
    assert got == want and any(d == 3 for d, _, _ in got)
    assert not any(d == 4 for d, _, _ in got)
    with pytest.raises(ValueError, match="min_len"):
        repeated_spans(df, min_len=1)


def test_remove_repeated_spans_rewrites_exactly(spark):
    from pipz_spark.datapipe import remove_repeated_spans, repeated_spans

    block = "shared-repeated-content-block-here"  # 34 chars
    docs = {
        1: f"prefix one {block} middle {block} suffix one",
        2: f"{block} opens doc two and that is all",
        3: "totally unique document three with no repeats at all",
        4: block,  # fully covered -> empty string
        5: None,  # NULL stays NULL
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_repeated_spans(df, min_len=20).collect()
    }
    spans = {
        d: sorted(
            (r["span_start"], r["span_end"])
            for r in repeated_spans(df, min_len=20).collect()
            if r["doc_id"] == d
        )
        for d in docs
    }
    for d, t in docs.items():
        if t is None:
            assert out[d] is None
            continue
        expect = ""
        pos = 1
        for s, e in spans[d]:
            expect += t[pos - 1 : s - 1]
            pos = e + 1
        expect += t[pos - 1 :]
        assert out[d] == expect, (d, out[d], expect)
    assert out[3] == docs[3]  # untouched
    assert out[4] == ""  # fully covered
    assert block not in out[1] and block not in out[2]
    # caller-supplied spans (clip policy) are honored
    custom = spark.createDataFrame([(1, 1, 6)], "doc_id long, span_start int, span_end int")
    got = {
        r["doc_id"]: r["clean_text"]
        for r in remove_repeated_spans(df, spans=custom).collect()
    }
    assert got[1] == docs[1][6:] and got[3] == docs[3]
    with pytest.raises(ValueError, match="clean_text"):
        remove_repeated_spans(df.withColumn("clean_text", F.lit("")))


def test_repeated_spans_short_docs_yield_nothing(spark):
    # r8 review (confirmed bug): sequence(1, 0) is the DESCENDING
    # [1, 0], which fabricated a span for every doc shorter than
    # min_len — short docs must contribute no positions, and the
    # rewrite must leave them verbatim, matching the oracle exactly
    import duckdb

    from pipz_spark.datapipe import remove_repeated_spans, repeated_spans

    docs = [(1, "tiny doc"), (2, ""), (3, "x" * 19)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    assert repeated_spans(df, min_len=20).count() == 0
    out = {r["doc_id"]: r["clean_text"] for r in remove_repeated_spans(df, min_len=20).collect()}
    assert out == dict(docs)
    # ...while a 25-char run of one character DOES self-repeat its
    # 20-gram (positions 1..6 share it) — one full-width span
    runs = spark.createDataFrame([(4, "y" * 25)], "doc_id long, text string")
    assert [tuple(r) for r in repeated_spans(runs, min_len=20).collect()] == [
        (4, 1, 25)
    ]
    # engine-vs-engine on a corpus CONTAINING short docs
    from pipz_spark.queries import QUERIES

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for d, t in docs + [(5, "z" * 45), (6, "z" * 45)]:
        con.execute("INSERT INTO documents VALUES (?, ?)", [d, t])
    oracle = {
        (r[0], r[1], r[2])
        for r in con.sql(QUERIES["dp_repeated_spans"].oracle).fetchall()
    }
    big = spark.createDataFrame(
        docs + [(5, "z" * 45), (6, "z" * 45)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in repeated_spans(big, min_len=20).collect()
    }
    assert got == oracle and (5, 1, 45) in got and (6, 1, 45) in got


def test_line_dedup_keep_first_and_reassemble(spark):
    from pipz_spark.datapipe import line_dedup

    docs = [
        (1, "a b c d"),       # lines(2): "a b", "c d" — both first
        (2, "c d e f"),       # "c d" dup (doc 1 idx 1 wins), "e f" new
        (3, "a b c d"),       # every line elsewhere-first → tombstone
        (4, "a b x"),         # trailing partial line "x" is its own line
        (5, "   "),           # blank input is excluded entirely
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
        for r in line_dedup(df, line_words=2).collect()
    }
    assert out == {
        1: ("a b c d", 2, 0),
        2: ("e f", 1, 1),
        3: ("", 0, 2),
        4: ("x", 1, 1),
    }


def test_line_dedup_validation(spark):
    from pipz_spark.datapipe import line_dedup

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="line_words"):
        line_dedup(df, line_words=0)


def test_bm25_topk_ranking_and_dedup_terms(spark):
    from pipz_spark.datapipe import bm25_topk

    # N=3, total_words=5, avgdl=5/3; df(apple)=2 → idf=0.6.
    # doc 2 (tf=1, dl=1) outranks doc 1 (tf=2, dl=3): BM25's length
    # norm beats the saturated extra occurrence. doc 3 never appears.
    df = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "apple"), (3, "cherry")],
        "doc_id long, text string",
    )
    # query 1 repeats the term — scored once, identical ranking
    out = bm25_topk(df, [(0, "apple"), (1, "apple apple")], k=10).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"])
        )
    for q in (0, 1):
        ranked = sorted(by_q[q])
        assert [d for _, d, _ in ranked] == [2, 1]
        assert ranked[0][2] > ranked[1][2]
    assert by_q[0] == by_q[1]
    # hand-computed: doc2 idf*tsat = 0.6 * 2.2/(1+1.2*0.7) = 0.717391
    assert abs(by_q[0][0][2] - 0.717391) < 1e-6


def test_bm25_topk_tiebreak_and_k(spark):
    from pipz_spark.datapipe import bm25_topk

    df = spark.createDataFrame(
        [(7, "same text"), (3, "same text"), (5, "same text")],
        "doc_id long, text string",
    )
    out = bm25_topk(df, [(0, "same")], k=2).orderBy("rank").collect()
    assert [(r["rank"], r["doc_id"]) for r in out] == [(1, 3), (2, 5)]


def test_bm25_topk_validation(spark):
    from pipz_spark.datapipe import bm25_topk

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k > 0"):
        bm25_topk(df, [(0, "a")], k=0)
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(df, [], k=1)
    with pytest.raises(ValueError, match="no terms"):
        bm25_topk(df, [(0, "  ")], k=1)


def test_bpe_train_matches_independent_reference(spark):
    # independent in-test trainer (same classic algorithm, separately
    # written): count pairs over per-char segs, merge argmax with
    # (-count, pair) tie-break, stop below freq 2
    from pipz_spark.datapipe import bpe_train

    corpus = [
        (1, "low low low low low"),
        (2, "lower lower newest newest newest newest newest newest"),
        (3, "widest widest widest"),
    ]
    import collections
    import re

    freq = collections.Counter(
        w
        for _, t in corpus
        for w in re.findall(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \x00-\x1f]", t)
    )
    segs = {w: tuple(w) for w in freq}
    expected = []
    for _ in range(8):
        counts = collections.Counter()
        for w, toks in segs.items():
            for p in zip(toks, toks[1:]):
                counts[p] += freq[w]
        best = min(counts, key=lambda p: (-counts[p], p))
        if counts[best] < 2:
            break
        expected.append(best)
        # apply the merge by regex over the space-joined segmentation:
        # lookarounds pin whole-token matches, re.sub is leftmost-first
        # non-overlapping — the BPE convention — and the implementation
        # under test never goes through strings this way
        pat = f"(?<!\\S){re.escape(best[0])} {re.escape(best[1])}(?!\\S)"
        segs = {
            w: tuple(re.sub(pat, best[0] + best[1], " ".join(toks)).split(" "))
            for w, toks in segs.items()
        }
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = bpe_train(df, n_merges=8)
    assert got == expected


def test_bpe_train_reproduces_checked_in_fixture(spark):
    # end-to-end determinism: the distributed histogram + shared merge
    # loop must byte-reproduce the fixture tools/train_bpe.py built
    # from the same sf0.001 corpus
    from pipz_spark.datapipe import bpe_train
    from pipz_spark.datapipe.bpe import load_merges
    from pipz_spark.sources.catalog import load_table

    fix = load_merges()  # trained with n_merges=40 (see its header)
    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    assert tuple(bpe_train(docs, n_merges=len(fix))) == fix
    # asking for more merges prefix-extends the same table — earlier
    # ranks never depend on how many later merges were requested
    more = bpe_train(docs, n_merges=len(fix) + 8)
    assert tuple(more[: len(fix)]) == fix and len(more) == len(fix) + 8


def test_bpe_train_validation(spark):
    from pipz_spark.datapipe import bpe_train

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(df, n_merges=-1)
    with pytest.raises(ValueError, match="max_vocab"):
        bpe_train(df, n_merges=1, max_vocab=2)


def test_save_merges_roundtrip(tmp_path):
    from pipz_spark.datapipe import save_merges
    from pipz_spark.datapipe.bpe import load_merges

    merges = [("l", "o"), ("lo", "w"), ("#", "#")]
    path = str(tmp_path / "m.txt")
    save_merges(merges, path)
    assert load_merges(path) == tuple(merges)


def test_top_ngrams_df_semantics_and_tiebreak(spark):
    from pipz_spark.datapipe import top_ngrams

    docs = [
        (1, "a b c a b c"),   # repeated in-doc gram counts ONCE (df, not tf)
        (2, "a b c"),
        (3, "b c a"),
        (4, "zz"),            # short doc: whole text is its one gram
        (5, "  "),            # blank: excluded
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [(r["rank"], r["gram"], r["df"])
           for r in top_ngrams(df, n=3, k=4).orderBy("rank").collect()]
    # doc 1's sliding grams: {"a b c", "b c a", "c a b"} — its repeat
    # of "a b c" counts ONCE (df, not tf); doc 3's whole text is the
    # gram "b c a"; doc 4 is below n tokens so its whole text is its
    # one gram; ties break on gram ascending
    assert got == [
        (1, "a b c", 2),   # docs 1, 2
        (2, "b c a", 2),   # docs 1, 3
        (3, "c a b", 1),
        (4, "zz", 1),
    ]
    with pytest.raises(ValueError, match="k > 0"):
        top_ngrams(df, k=0)
    with pytest.raises(ValueError, match="n > 0"):
        top_ngrams(df, n=0)


def test_gopher_quality_rule_boundaries(spark):
    from pipz_spark.datapipe import gopher_quality

    # 50 words, mean word len 4.9, all alphabetic, 5 'the' stopwords
    good = ("the quick brown foxes jumped over their lazy sleeping dogs "
            * 5).rstrip()
    docs = [
        (1, good),                          # passes every rule
        (2, "word " * 49),                  # 49 words: below min_words
        (3, ("a " * 25 + "the " * 25)),     # mean word len 1.5 < 3
        # both replacements hit all 5 repeats: 10 digit words of 50
        (4, good.replace("quick", "12345").replace("brown", "67890")),
        (5, good.replace("the", "xxx")),    # 0 stopwords
        (6, good + " " + ("# " * 6).rstrip()),  # symbol ratio 6/56 > 0.1
        (7, "   "),                         # blank: keep false, 0 words
        (8, None),                          # NULL text: same as blank
        (9, "\n\t \n"),                     # whitespace-only: also blank
        (10, "\t" + good + "\n"),           # wrapping whitespace must not
                                            # mint phantom '' words
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in gopher_quality(df).collect()}
    assert len(out) == 10  # the report covers its input universe
    assert out[1]["keep"] is True and out[1]["n_words"] == 50
    assert out[2]["keep"] is False and out[2]["n_words"] == 49
    assert out[3]["keep"] is False and out[3]["mean_word_len"] < 3.0
    # doc 4 sits exactly AT the 0.80 alpha boundary (>= keeps it)
    assert out[4]["alpha_ratio"] == 0.8 and out[4]["keep"] is True
    assert out[5]["keep"] is False and out[5]["stopword_hits"] == 0
    assert out[6]["keep"] is False and out[6]["symbol_ratio"] > 0.1
    for d in (7, 8, 9):
        assert out[d]["keep"] is False and out[d]["n_words"] == 0
        assert out[d]["mean_word_len"] is None
    # doc 10 = doc 1 wrapped in \t...\n: identical metrics, still kept
    assert out[10] == {**out[1], "doc_id": 10}


def test_perplexity_buckets_ntile_invariants(spark, documents):
    # the distributed rank machine must reproduce SQL ntile exactly:
    # per-language tier sizes differ by <= 1, the first (n mod b)
    # tiers carry the extras, and tier 1 holds the highest scores
    from pipz_spark.datapipe import perplexity_buckets, release_caches

    try:
        out = perplexity_buckets(documents, buckets=3).collect()
    finally:
        release_caches()
    assert len(out) == documents.count()
    by_lang: dict = {}
    for r in out:
        if r["ppl_bucket"] is None:
            assert r["lm_logp"] is None and r["n_bigrams"] == 0
            continue
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        sizes = {}
        for r in rows:
            sizes[r["ppl_bucket"]] = sizes.get(r["ppl_bucket"], 0) + 1
        n = len(rows)
        q, rem = divmod(n, 3)
        want = {b: q + (1 if b <= rem else 0) for b in (1, 2, 3) if q or b <= rem}
        assert sizes == want, (lang, sizes, want)
        # tiers are ordered by score: every tier-1 doc scores >= every
        # tier-3 doc (ties broken by doc_id inside a tier boundary)
        rows.sort(key=lambda r: (-r["lm_logp"], r["doc_id"]))
        seen = [r["ppl_bucket"] for r in rows]
        assert seen == sorted(seen), lang


def test_perplexity_buckets_matches_window_ntile(spark, documents):
    # tiny-corpus cross-check against Spark's own ntile window (the
    # single-task formulation the operator exists to avoid at scale)
    from pyspark.sql import Window

    from pipz_spark.datapipe import perplexity_buckets, release_caches

    docs = documents.limit(97)
    try:
        got = {
            r["doc_id"]: r["ppl_bucket"]
            for r in perplexity_buckets(docs, buckets=4, num_partitions=7).collect()
        }
    finally:
        release_caches()
    from pipz_spark.datapipe import lm_quality_scores

    scores = docs.select("doc_id", "lang").join(lm_quality_scores(docs), "doc_id")
    w = Window.partitionBy("lang").orderBy(F.col("lm_logp").desc(), F.col("doc_id"))
    want = {
        r["doc_id"]: r["b"]
        for r in scores.where(F.col("lm_logp").isNotNull())
        .select("doc_id", F.ntile(4).over(w).alias("b"))
        .collect()
    }
    scored = {k: v for k, v in got.items() if v is not None}
    assert scored == want


def test_perplexity_buckets_plan_has_range_exchange(spark, documents):
    # the scale contract: ranking rides a range exchange with an
    # explicit partition count, never a per-language window sort over
    # the whole frame (the skewed-key hazard — one language = one task)
    from pipz_spark.datapipe import perplexity_buckets, release_caches

    df = perplexity_buckets(documents, buckets=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    release_caches()
    assert "rangepartitioning" in plan
    # every window over the full frame is keyed by _pid; the only
    # lang-keyed window runs over the tiny per-partition counts frame
    main_windows = [
        ln for ln in plan.splitlines()
        if "windowspecdefinition" in ln and "lm_logp" in ln
    ]
    assert main_windows, "expected the local-rank window in the plan"
    for ln in main_windows:
        assert "_pid" in ln, "full-frame window missing the _pid key: " + ln[:200]


def test_perplexity_buckets_validation(spark, documents):
    import pytest as _pytest

    from pipz_spark.datapipe import perplexity_buckets

    with _pytest.raises(ValueError):
        perplexity_buckets(documents, buckets=0)


def test_semantic_dedup_clusters_and_keepers(spark, embeddings):
    # keep-one-per-semantic-group over the embedding corpus: every
    # vector labeled, exactly one keeper per cluster, keeper = min id,
    # and the clustering agrees with a driver-side union-find of the
    # operator's own pair stage
    from pipz_spark.datapipe import (
        embedding_near_dup_pairs,
        release_caches,
        semantic_dedup,
    )

    try:
        out = semantic_dedup(embeddings, threshold=0.4, bits=3, tables=32).collect()
        pairs = embedding_near_dup_pairs(
            embeddings, threshold=0.4, bits=3, tables=32
        ).collect()
    finally:
        release_caches()
    assert len(out) == embeddings.count()
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for p in pairs:
        a, b = find(p["id_a"]), find(p["id_b"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    # min present id per union-find root is the expected label
    want_label: dict = {}
    for r in out:
        root = find(r["vec_id"])
        want_label[root] = min(want_label.get(root, r["vec_id"]), r["vec_id"])
    clusters: dict = {}
    for r in out:
        assert r["cluster_id"] == want_label[find(r["vec_id"])]
        assert r["is_keeper"] == (r["vec_id"] == r["cluster_id"])
        clusters.setdefault(r["cluster_id"], []).append(r)
    for cid, members in clusters.items():
        assert cid == min(m["vec_id"] for m in members)
        assert sum(1 for m in members if m["is_keeper"]) == 1


def test_perplexity_buckets_fewer_docs_than_buckets(spark):
    # n < buckets per language: ntile gives each row its own tier
    # (tiers 1..n) — the q=0 branch of the closed-form rule, where
    # the guarded second division must never evaluate
    from pipz_spark.datapipe import perplexity_buckets, release_caches

    df = spark.createDataFrame(
        [(1, "aa bb cc", "en"), (2, "dd ee ff", "en"), (3, "gg hh", "fr")],
        "doc_id long, text string, lang string",
    )
    try:
        out = {r["doc_id"]: r["ppl_bucket"]
               for r in perplexity_buckets(df, buckets=5).collect()}
    finally:
        release_caches()
    assert sorted(out[i] for i in (1, 2)) == [1, 2]
    assert out[3] == 1


def test_grouped_rank_matches_window_row_number(spark, orders):
    # the distributed rank machine must equal the single-task window
    # formulation row-for-row on any total order — and be INVARIANT
    # to the partition count (range boundaries shift balance, never
    # ranks; 1 partition = the degenerate single-slice case)
    from pyspark.sql import Window

    from pipz_spark.datapipe import grouped_rank, release_caches

    df = orders.limit(2000).select("o_orderkey", "o_orderstatus", "o_totalprice")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    cnt = Window.partitionBy("o_orderstatus")
    want = {
        r["o_orderkey"]: (r["r"], r["n"])
        for r in df.select(
            "o_orderkey",
            F.row_number().over(w).alias("r"),
            F.count(F.lit(1)).over(cnt).alias("n"),
        ).collect()
    }
    for n_parts in (1, 13, 40):
        try:
            got = {
                r["o_orderkey"]: (r["rank"], r["group_count"])
                for r in grouped_rank(
                    df,
                    group_cols=["o_orderstatus"],
                    order_cols=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
                    num_partitions=n_parts,
                ).collect()
            }
        finally:
            release_caches()
        assert got == want, f"diverged at num_partitions={n_parts}"


def test_grouped_rank_validation(spark, orders):
    import pytest as _pytest

    from pipz_spark.datapipe import grouped_rank, ntile_expr

    with _pytest.raises(ValueError):
        grouped_rank(orders, group_cols=[], order_cols=[F.col("o_orderkey")])
    with _pytest.raises(ValueError):
        ntile_expr(F.lit(1), F.lit(1), 0)


def test_dsir_log_ratio_prefers_target_like_text(spark):
    # a pool doc made of the target's own vocabulary must outscore a
    # pool doc of vocabulary the target never uses (the whole point of
    # importance weighting), and weights are finite/deterministic
    from pipz_spark.datapipe import dsir_log_ratio

    target = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta") for i in range(10)],
        "doc_id long, text string",
    )
    pool = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),         # target-like
            (2, "zork quux blarg frobnitz"), # out-of-target vocab
            (3, ""),                         # no tokens
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dsir_log_ratio(pool, target).collect()}
    assert out[1]["dsir_logratio"] > out[2]["dsir_logratio"]
    assert out[3]["dsir_logratio"] is None and out[3]["n_tokens"] == 0
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 4
    with __import__("pytest").raises(ValueError):
        dsir_log_ratio(pool, target, n_buckets=0)


def test_grouped_rank_null_group_rows_survive(spark):
    # NULL group values form their own ranked group (the groupBy /
    # window convention); a plain equi-join on the group key would
    # silently DROP these rows — the null-safe join is the contract
    from pipz_spark.datapipe import grouped_rank, release_caches

    df = spark.createDataFrame(
        [(1, "en", 0.5), (2, "en", 0.7), (3, None, 0.9), (4, None, 0.1)],
        "id long, lang string, score double",
    )
    try:
        out = {r["id"]: (r["rank"], r["group_count"]) for r in grouped_rank(
            df, ["lang"], [F.col("score").desc(), F.col("id")]
        ).collect()}
    finally:
        release_caches()
    assert out == {1: (2, 2), 2: (1, 2), 3: (1, 2), 4: (2, 2)}


# ---- r12: distributed Lloyd k-means ---------------------------------


def _ref_kmeans(ids_vecs, k, iters, cq=10**7, dq=10**9, salt="kmeans"):
    """Pure-Python replay of kmeans_embeddings' exact arithmetic
    contract (same md5 seed order, same integer quantization) — an
    engine-independent oracle for the unit test."""
    import hashlib
    import math

    def h(i):
        return hashlib.md5((str(i) + salt).encode()).hexdigest()

    seeds = sorted(ids_vecs, key=lambda r: (h(r[0]), r[0]))[:k]
    cent = [[math.floor(x * cq + 0.5) / cq for x in v] for _, v in seeds]

    def dist(v, c):
        return sum(
            math.floor((x - cc) * (x - cc) * dq + 0.5) for x, cc in zip(v, c)
        )

    def assign(v):
        return min(range(k), key=lambda j: (dist(v, cent[j]), j))

    for _ in range(iters):
        sums: dict = {}
        for i, v in ids_vecs:
            j = assign(v)
            s, n = sums.get(j, ([0] * len(v), 0))
            sums[j] = ([a + math.floor(x * cq + 0.5) for a, x in zip(s, v)], n + 1)
        for j, (s, n) in sums.items():
            cent[j] = [si / (n * cq) for si in s]
    return {i: (assign(v), dist(v, cent[assign(v)])) for i, v in ids_vecs}


def test_kmeans_matches_python_replay(spark):
    from pipz_spark.datapipe import kmeans_embeddings

    ids_vecs = [
        (i, [((i * 7 + d * 3) % 13) / 13.0 - 0.5 for d in range(4)])
        for i in range(40)
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in ids_vecs], "vec_id long, embedding array<double>"
    )
    want = _ref_kmeans(ids_vecs, k=3, iters=2)
    got = {
        r["vec_id"]: (r["cell"], r["dist_q"])
        for r in kmeans_embeddings(df, k=3, iters=2).collect()
    }
    assert got == want


def test_kmeans_partition_invariant_and_deterministic(spark, embeddings):
    from pipz_spark.datapipe import kmeans_embeddings

    base = {
        r["vec_id"]: (r["cell"], r["dist_q"])
        for r in kmeans_embeddings(embeddings, k=4, iters=1).collect()
    }
    assert len(base) == embeddings.count()
    assert all(0 <= c < 4 and d >= 0 for c, d in base.values())
    again = {
        r["vec_id"]: (r["cell"], r["dist_q"])
        for r in kmeans_embeddings(embeddings.repartition(7), k=4, iters=1).collect()
    }
    assert again == base


def test_kmeans_excludes_null_vectors_and_validates(spark):
    from pipz_spark.datapipe import kmeans_embeddings

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, None), (4, [0.9, 1.1])],
        "vec_id long, embedding array<double>",
    )
    out = kmeans_embeddings(df, k=2, iters=1).collect()
    assert sorted(r["vec_id"] for r in out) == [1, 2, 4]
    with pytest.raises(ValueError):
        kmeans_embeddings(df, k=1)
    with pytest.raises(ValueError):
        kmeans_embeddings(df, k=2, iters=-1)
    with pytest.raises(ValueError):
        kmeans_embeddings(df, k=4)  # only 3 non-null vectors


# ---- r12: priority sampling ------------------------------------------


def test_priority_sample_matches_python_replay(spark, documents):
    import hashlib

    from pipz_spark.datapipe import priority_sample

    rows = documents.select("doc_id", "n_chars").collect()

    def prio(doc_id, w):
        h = int(
            hashlib.md5((str(doc_id) + "priority").encode()).hexdigest()[:13], 16
        )
        return float(w) / ((h + 1) / 2.0**52)

    eligible = [(r["doc_id"], r["n_chars"]) for r in rows if r["n_chars"] and r["n_chars"] > 0]
    want = sorted(eligible, key=lambda t: (-prio(*t), t[0]))[:50]
    got = priority_sample(documents, 50, "n_chars").collect()
    assert [(r["doc_id"], r["n_chars"]) for r in got] == want
    # doubles agree bit-for-bit with the Python IEEE replay
    assert [r["priority"] for r in got] == [prio(i, w) for i, w in want]


def test_priority_sample_weight_gate_and_validation(spark):
    from pipz_spark.datapipe import priority_sample

    df = spark.createDataFrame(
        [(1, 10.0), (2, 0.0), (3, -4.0), (4, None), (5, 2.5)],
        "doc_id long, w double",
    )
    out = priority_sample(df, 10, "w", id_col="doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 5]
    with pytest.raises(ValueError):
        priority_sample(df, 0, "w")


# ---- r12: exact stratified split -------------------------------------


def test_exact_split_counts_are_exact(spark, documents):
    import math

    from pipz_spark.datapipe import exact_stratified_split, release_caches

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    try:
        out = exact_stratified_split(documents, fr).select(
            "doc_id", "lang", "split"
        )
        got = {
            (r["lang"], r["split"]): r["n"]
            for r in out.groupBy("lang", "split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        sizes = {
            r["lang"]: r["n"]
            for r in documents.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
        }
    finally:
        release_caches()
    for lang, n in sizes.items():
        b1 = math.floor(0.8 * n + 0.5)
        b2 = math.floor(0.9 * n + 0.5)
        assert got.get((lang, "train"), 0) == b1
        assert got.get((lang, "val"), 0) == b2 - b1
        assert got.get((lang, "test"), 0) == n - b2
    assert sum(got.values()) == sum(sizes.values())


def test_exact_split_validation(spark, documents):
    from pipz_spark.datapipe import exact_stratified_split

    with pytest.raises(ValueError):
        exact_stratified_split(documents, {"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError):
        exact_stratified_split(
            documents.withColumn("split", F.lit("x")), {"a": 1.0}
        )


# ---- r12: logistic-regression quality classifier ---------------------


def test_quality_classifier_separates_vocabularies(spark):
    # a pool doc written in the target's vocabulary must outscore a
    # pool doc of vocabulary the target never uses — the whole point
    # of the GPT-3 selection classifier — and empty docs score 0 with
    # n_tokens 0 (never dropped, never NULL)
    from pipz_spark.datapipe import train_quality_classifier

    rows = [(100 + i, "alpha beta gamma delta", 1) for i in range(10)] + [
        (1, "alpha beta gamma", 0),
        (2, "zork quux blarg frobnitz", 0),
        (3, "", 0),
        (4, None, 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t int")
    out = {
        r["doc_id"]: r
        for r in train_quality_classifier(
            df, F.col("is_t") == 1, id_col="doc_id", epochs=2
        ).collect()
    }
    assert out[1]["clf_score"] > out[2]["clf_score"]
    assert out[3]["clf_score"] == 0.0 and out[3]["n_tokens"] == 0
    assert out[4]["clf_score"] == 0.0 and out[4]["n_tokens"] == 0
    assert out[100]["label"] == 1 and out[1]["label"] == 0
    with pytest.raises(ValueError):
        train_quality_classifier(df, F.col("is_t") == 1, n_buckets=0)
    with pytest.raises(ValueError):
        train_quality_classifier(df, F.col("is_t") == 1, epochs=-1)


def test_quality_classifier_partition_invariant(spark, documents):
    # full-batch GD: batch order cannot matter, so the trained scores
    # are identical under any input partitioning
    from pipz_spark.datapipe import train_quality_classifier

    t = F.col("doc_id") % 50 == 0
    base = {
        r["doc_id"]: r["clf_score"]
        for r in train_quality_classifier(
            documents.limit(200), t, epochs=1
        ).collect()
    }
    again = {
        r["doc_id"]: r["clf_score"]
        for r in train_quality_classifier(
            documents.limit(200).repartition(11), t, epochs=1
        ).collect()
    }
    assert again == base


# ---- r12: no-crossing FFD packing -------------------------------------


def _ref_ffd(rows, budget):
    """Pure-Python replay of pack_ffd's per-shard first-fit-decreasing
    contract: (tokens DESC, doc, chunk) order, first bin with room."""
    out = {}
    for shard in sorted({r[3] for r in rows}):
        members = sorted(
            (r for r in rows if r[3] == shard),
            key=lambda r: (-r[2], r[0], r[1]),
        )
        fills: list = []
        for doc, chunk, t, _ in members:
            for j, fill in enumerate(fills):
                if fill + t <= budget:
                    fills[j] = fill + t
                    out[(doc, chunk)] = (shard, j)
                    break
            else:
                out[(doc, chunk)] = (shard, len(fills))
                fills.append(t)
    return out


def test_pack_ffd_matches_python_replay_and_invariants(spark):
    import hashlib

    from pipz_spark.datapipe import pack_ffd

    budget = 100
    rows = [
        (d, c, 10 + (d * 13 + c * 7) % 85)
        for d in range(30)
        for c in range((d % 4) + 1)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, chunk_id long, n_chunk_tokens long"
    )
    got = pack_ffd(df, budget, shards=4).collect()
    assert len(got) == len(rows)  # every chunk exactly once
    # shard derivation replay + exact FFD replay
    def shard_of(d):
        return int(hashlib.md5((str(d) + "pack").encode()).hexdigest()[8:16], 16) % 4
    ref_rows = [(d, c, t, shard_of(d)) for d, c, t in rows]
    want = _ref_ffd(ref_rows, budget)
    for r in got:
        assert (r["shard"], r["pack_id"]) == want[(r["doc_id"], r["chunk_id"])]
    # capacity: no pack exceeds budget (no oversize chunks here)
    fills: dict = {}
    toks = {(d, c): t for d, c, t in rows}
    for r in got:
        key = (r["shard"], r["pack_id"])
        fills[key] = fills.get(key, 0) + toks[(r["doc_id"], r["chunk_id"])]
    assert all(v <= budget for v in fills.values())
    # partition invariance (full-shard FFD cannot see input layout)
    again = {
        (r["doc_id"], r["chunk_id"]): (r["shard"], r["pack_id"])
        for r in pack_ffd(df.repartition(7), budget, shards=4).collect()
    }
    assert again == want
    # all chunks of one doc share a shard (no doc straddles shards)
    by_doc: dict = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], set()).add(r["shard"])
    assert all(len(s) == 1 for s in by_doc.values())


def test_pack_ffd_oversize_chunk_gets_own_pack(spark):
    from pipz_spark.datapipe import pack_ffd

    df = spark.createDataFrame(
        [(1, 0, 500), (1, 1, 30), (1, 2, 40)],
        "doc_id long, chunk_id long, n_chunk_tokens long",
    )
    out = {r["chunk_id"]: r["pack_id"] for r in pack_ffd(df, 100, shards=1).collect()}
    assert out[0] not in (out[1], out[2])  # oversize isolated
    assert out[1] == out[2]  # the two small chunks co-pack
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pack_ffd(df, 0)
    with _pytest.raises(ValueError, match="shards"):
        pack_ffd(df, 100, shards=0)
    with _pytest.raises(ValueError, match="shards"):
        pack_ffd(df, 100, shards=-3)


def test_pack_ffd_text_never_crosses_arrow_boundary(spark):
    """A wide frame (text column) packs fine AND the text stays out
    of the packer: the FlatMapGroupsInPandas node must list only the
    skinny (shard, ids, count) columns — the r12 verdict's wide-frame
    pass-through fix, asserted on the executed plan."""
    from pipz_spark.datapipe import pack_ffd

    df = spark.createDataFrame(
        [(d, c, 10 + (d * 13 + c * 7) % 85, "x" * 200) for d in range(20) for c in range(2)],
        "doc_id long, chunk_id long, n_chunk_tokens long, text string",
    )
    out = pack_ffd(df, 100, shards=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    arrow_lines = [ln for ln in plan.splitlines() if "FlatMapGroupsInPandas" in ln]
    assert arrow_lines, plan
    assert all("text" not in ln for ln in arrow_lines), arrow_lines
    rows = out.collect()
    assert len(rows) == 40
    assert all(r["text"] == "x" * 200 for r in rows)
    # same assignments as packing the skinny frame alone
    skinny = {
        (r["doc_id"], r["chunk_id"]): (r["shard"], r["pack_id"])
        for r in pack_ffd(df.drop("text"), 100, shards=4).collect()
    }
    assert {
        (r["doc_id"], r["chunk_id"]): (r["shard"], r["pack_id"]) for r in rows
    } == skinny


def test_pack_ffd_null_tokens_fail_fast(spark):
    from pipz_spark.datapipe import pack_ffd

    df = spark.createDataFrame(
        [(1, 0, 50), (1, 1, None), (2, 0, 40)],
        "doc_id long, chunk_id long, n_chunk_tokens long",
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="NULL n_chunk_tokens"):
        pack_ffd(df, 100, shards=2).collect()


def test_priority_sample_estimator_matches_replay(spark, documents):
    import hashlib

    from pipz_spark.datapipe import priority_sample

    def prio(doc_id, w):
        h = int(
            hashlib.md5((str(doc_id) + "priority").encode()).hexdigest()[:13], 16
        )
        return float(w) / ((h + 1) / 2.0**52)

    rows = [
        (r["doc_id"], r["n_chars"])
        for r in documents.select("doc_id", "n_chars").collect()
        if r["n_chars"] and r["n_chars"] > 0
    ]
    ordered = sorted(rows, key=lambda t: (-prio(*t), t[0]))
    n = 50
    tau = prio(*ordered[n])  # population > n+1 here
    got = priority_sample(documents, n, "n_chars", estimate=True).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in ordered[:n]]
    for r, (d, w) in zip(got, ordered[:n]):
        assert r["est_weight"] == max(float(w), tau)
    # τ = 0 when the whole population fits in the sample: every
    # est_weight is the row's own weight (the estimator is exact)
    small = priority_sample(
        documents.limit(5), 50, "n_chars", estimate=True
    ).collect()
    assert all(r["est_weight"] == float(r["n_chars"]) for r in small)


# ---- r13: PageRank / HLL sketch / Pareto keep rule ----------------


def _ref_pagerank(edge_pairs, iters, init_q=10**12, num=17, den=20):
    """Pure-Python replay of pagerank's integer fixed-point contract."""
    nodes = sorted({s for s, _ in edge_pairs} | {d for _, d in edge_pairs})
    deg: dict = {}
    for s, _ in edge_pairs:
        deg[s] = deg.get(s, 0) + 1
    base = (init_q * (den - num)) // den
    rank = {n: init_q for n in nodes}
    for _ in range(iters):
        ins: dict = {}
        for s, d in edge_pairs:
            if deg.get(s, 0) > 0:
                ins[d] = ins.get(d, 0) + rank[s] // deg[s]
        rank = {n: base + (ins.get(n, 0) * num) // den for n in nodes}
    return {n: (rank[n], deg.get(n, 0)) for n in nodes}


def test_pagerank_matches_integer_replay(spark):
    from pipz_spark.datapipe import pagerank

    # small digraph with a dangling node (d has no out-edges), a
    # multi-edge (a->b twice: weight 2), and a cycle
    pairs = [
        ("a", "b"), ("a", "b"), ("a", "c"), ("b", "c"),
        ("c", "a"), ("c", "d"), ("e", "a"),
    ]
    df = spark.createDataFrame(pairs, "src string, dst string")
    got = {
        r["node"]: (r["rank_q"], r["outdeg"])
        for r in pagerank(df, iters=3).collect()
    }
    assert got == _ref_pagerank(pairs, 3)
    # partition invariance: integer sums are order-independent
    again = {
        r["node"]: (r["rank_q"], r["outdeg"])
        for r in pagerank(df.repartition(5), iters=3).collect()
    }
    assert again == got
    # mass conservation sans damping leakage: every node's rank is
    # at least the teleport base and the dangling node keeps exactly
    # base + its damped in-flow
    base = (10**12 * 3) // 20
    assert all(rq >= base for rq, _ in got.values())
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pagerank(df, iters=-1)
    with _pytest.raises(ValueError):
        pagerank(df, damping=(20, 17))


def test_pagerank_zero_iters_is_init(spark):
    from pipz_spark.datapipe import pagerank

    df = spark.createDataFrame([("x", "y")], "src string, dst string")
    got = {r["node"]: r["rank_q"] for r in pagerank(df, iters=0).collect()}
    assert got == {"x": 10**12, "y": 10**12}


def test_pagerank_checkpoint_every_identical(spark):
    """checkpoint_every truncates lineage only — 12 iterations with a
    checkpoint every 4 are value-identical to the uncheckpointed run
    and to the pure-Python replay (r13 verdict ask #3)."""
    from pipz_spark.datapipe import pagerank

    pairs = [
        ("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
        ("d", "a"), ("e", "a"), ("a", "e"),
    ]
    df = spark.createDataFrame(pairs, "src string, dst string")
    plain = {
        r["node"]: (r["rank_q"], r["outdeg"])
        for r in pagerank(df, iters=12).collect()
    }
    ckpt = {
        r["node"]: (r["rank_q"], r["outdeg"])
        for r in pagerank(df, iters=12, checkpoint_every=4).collect()
    }
    assert ckpt == plain == _ref_pagerank(pairs, 12)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pagerank(df, checkpoint_every=0)


def test_pagerank_star_hub_no_overflow(spark):
    """Divide-first damping keeps the intermediate ≤ the in-sum: a
    star graph whose hub receives nearly the full corpus mass at the
    documented bound init_q ≈ 2^62/n must NOT wrap (the r13 ADVICE
    medium: multiplying the sum by num first overflows here)."""
    from pipz_spark.datapipe import pagerank

    n = 64
    init_q = (2**62) // n  # documented safety bound, exactly
    pairs = [(f"s{i}", "hub") for i in range(n - 1)]
    df = spark.createDataFrame(pairs, "src string, dst string")
    got = {
        r["node"]: (r["rank_q"], r["outdeg"])
        for r in pagerank(df, iters=2, init_q=init_q).collect()
    }
    assert got == _ref_pagerank(pairs, 2, init_q=init_q)
    # the hub's rank is positive and huge — a silent wrap would have
    # driven it negative
    assert got["hub"][0] > init_q


def _ref_hll(values, b, salt="hll"):
    """Pure-Python replay of hll_distinct's register contract."""
    import hashlib
    import math

    m = 1 << b
    hb = b // 4
    regs: dict = {}
    for u in values:
        if u is None:
            continue
        h = hashlib.md5((str(u) + salt).encode()).hexdigest()
        bkt = int(h[:hb], 16)
        st = h[hb : hb + 13].lstrip("0")
        if not st:
            rho = 53
        else:
            z = 13 - len(st)
            v = int(st[0], 16)
            extra = 0 if v >= 8 else (1 if v >= 4 else (2 if v >= 2 else 3))
            rho = 4 * z + extra + 1
        regs[bkt] = max(regs.get(bkt, 0), rho)
    sp = sum(1 << (50 - min(r, 50)) for r in regs.values())
    vempty = m - len(regs)
    s = sp + vempty * (1 << 50)
    numer = 0.7213 / (1.0 + 1.079 / m) * m * m * float(2**50)
    raw = numer / s
    if raw <= 2.5 * m and vempty > 0:
        est = m * (math.floor(math.log(m / vempty) * 1e6 + 0.5) / 1e6)
    else:
        est = raw
    return est, s, vempty


def test_hll_matches_replay_and_estimates_well(spark):
    from pipz_spark.datapipe import hll_distinct

    # two groups: one small (linear-counting branch), one large
    # enough at m=256 to take the raw-HLL branch
    rows = [("small", i) for i in range(40)] + [
        ("large", 1_000_000 + i) for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["g"]: (r["hll_distinct"], r["hll_s"], r["hll_empty"])
        for r in hll_distinct(df, "v", ["g"], b=8).collect()
    }
    want = {
        "small": _ref_hll(list(range(40)), 8),
        "large": _ref_hll([1_000_000 + i for i in range(5000)], 8),
    }
    assert got == want
    # the branches actually differ: small has many empty registers
    assert got["small"][2] > 0
    # accuracy: within 3 standard errors (1.04/sqrt(256) ~ 6.5%)
    assert abs(got["small"][0] - 40) / 40 < 0.2
    assert abs(got["large"][0] - 5000) / 5000 < 0.2
    # NULLs ignored; global (ungrouped) mode works
    df2 = spark.createDataFrame(
        [(None,), (1,), (2,), (1,)], "v long"
    )
    g = hll_distinct(df2, "v", b=8).collect()
    assert len(g) == 1
    assert g[0]["hll_distinct"] == _ref_hll([1, 2], 8)[0]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hll_distinct(df, "v", b=10)  # not a multiple of 4


def test_hll_registers_merge_across_unions(spark):
    # the property that makes HLL the scale tool: sketching a union
    # equals sketching the parts — max-merge over the same registers
    from pipz_spark.datapipe import hll_distinct

    a = spark.createDataFrame([(i,) for i in range(300)], "v long")
    b = spark.createDataFrame([(i,) for i in range(150, 450)], "v long")
    whole = hll_distinct(a.union(b), "v", b=8).collect()[0]
    parts = hll_distinct(a, "v", b=8).unionByName(
        hll_distinct(b, "v", b=8)
    )
    # merging the two final estimates is NOT valid; re-sketching the
    # union is — this asserts the estimate is a pure function of the
    # value SET (duplicates across parts don't move it)
    dedup_whole = hll_distinct(
        a.union(b).distinct(), "v", b=8
    ).collect()[0]
    assert whole["hll_distinct"] == dedup_whole["hll_distinct"]
    assert whole["hll_s"] == dedup_whole["hll_s"]
    assert parts.count() == 2


def test_pareto_keep_matches_replay(spark):
    import hashlib
    import math

    from pipz_spark.datapipe import pareto_keep

    rows = [(i, -8.0 + i * 0.4) for i in range(50)]  # scores -8..11.6
    df = spark.createDataFrame(rows, "doc_id long, clf_score double")
    for alpha in (2, 9):
        got = {
            r["doc_id"]: r["keep_p"]
            for r in pareto_keep(df, alpha=alpha).collect()
        }
        want = {}
        for did, s in rows:
            p = math.floor((1.0 / (1.0 + math.exp(-s))) * 1e6 + 0.5) / 1e6
            x = 2.0 - p
            r = x
            for bit in bin(alpha)[3:]:
                r = r * r
                if bit == "1":
                    r = r * x
            u = (
                int(
                    hashlib.md5((str(did) + "clfkeep").encode()).hexdigest()[:13],
                    16,
                )
                + 1.0
            ) / 4503599627370496.0
            if u < 1.0 / r:
                want[did] = p
        assert got == want, alpha
    # monotone in expectation: a high-score doc is kept surely
    sure = spark.createDataFrame([(1, 50.0)], "doc_id long, clf_score double")
    assert pareto_keep(sure, alpha=9).count() == 1  # p=1 -> thresh=1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pareto_keep(df, alpha=0)


def test_bloom_contamination_superset_and_fp_replay(spark, documents):
    """Default sizing flags a SUPERSET of exact contamination (equal
    here: FP rate ~1e-9 at sf0.001-scale gram counts); a deliberately
    tiny 2-word filter forces heavy false positives and must equal
    the pure-Python bitmap replay bit-for-bit."""
    import hashlib
    import re

    from pipz_spark.datapipe import bloom_contamination, contamination

    ev = documents.where(F.col("doc_id") % 50 == 0)
    tr = documents.where(F.col("doc_id") % 50 != 0)
    exact = {r["doc_id"]: r["n_collisions"] for r in contamination(tr, ev, n=4).collect()}
    flagged = {
        r["doc_id"]: r["n_flagged"] for r in bloom_contamination(tr, ev, n=4).collect()
    }
    assert set(exact) <= set(flagged)
    assert all(flagged[d] >= exact[d] for d in exact)

    got_small = {
        r["doc_id"]: r["n_flagged"]
        for r in bloom_contamination(tr, ev, n=4, n_words=2, k=2).collect()
    }

    def grams(text, n=4):
        t = [w for w in re.split(r"\s+", text.strip().lower()) if w]
        if not t:
            return set()
        return {" ".join(t[s : s + n]) for s in range(max(len(t) - (n - 1), 1))}

    def pos(g, i, m_bits):
        return (
            int(hashlib.md5((g + "bloom" + str(i)).encode()).hexdigest()[:13], 16)
            % m_bits
        )

    ev_rows = [r["text"] for r in ev.collect() if r["text"] and r["text"].strip()]
    tr_rows = [
        (r["doc_id"], r["text"])
        for r in tr.collect()
        if r["text"] and r["text"].strip()
    ]
    eg = set().union(*[grams(t) for t in ev_rows]) if ev_rows else set()
    m_bits = 2 * 48
    words = [0, 0]
    for g in eg:
        for i in range(2):
            p = pos(g, i, m_bits)
            words[p // 48] |= 1 << (p % 48)
    want = {}
    for did, t in tr_rows:
        nf = sum(
            1
            for g in grams(t)
            if all(
                (words[pos(g, i, m_bits) // 48] >> (pos(g, i, m_bits) % 48)) & 1
                for i in range(2)
            )
        )
        if nf:
            want[did] = nf
    assert got_small == want
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bloom_contamination(tr, ev, n_words=0)


def test_hll_sketch_merge_equals_whole(spark):
    """The merge law, end to end: sketch two overlapping parts
    separately, union + hll_merge the register frames, estimate —
    result is BIT-IDENTICAL to sketching the union directly (max is
    idempotent/associative/commutative), which is how per-day
    sketches answer any date-range distinct query without rescans."""
    from pipz_spark.datapipe import (
        hll_distinct,
        hll_estimate,
        hll_merge,
        hll_sketch,
    )

    a = spark.createDataFrame([("g", i) for i in range(400)], "g string, v long")
    b = spark.createDataFrame(
        [("g", i) for i in range(200, 700)], "g string, v long"
    )
    merged = hll_merge(
        hll_sketch(a, "v", ["g"]).unionByName(hll_sketch(b, "v", ["g"])), ["g"]
    )
    got = hll_estimate(merged, ["g"]).collect()[0]
    whole = hll_distinct(a.union(b), "v", ["g"]).collect()[0]
    assert (got["hll_distinct"], got["hll_s"], got["hll_empty"]) == (
        whole["hll_distinct"],
        whole["hll_s"],
        whole["hll_empty"],
    )


def test_doremi_weights_matches_replay_and_invariants(spark):
    import math

    from pipz_spark.datapipe import doremi_weights

    rows = [
        ("en", 1.0), ("en", 2.0), ("en", 3.0),
        ("de", 4.0), ("de", 6.0),
        ("fr", 0.5),
        ("zh", None),  # NULL loss excluded
        (None, 9.0),   # NULL domain excluded
    ]
    df = spark.createDataFrame(rows, "lang string, loss double")
    got = {
        r["lang"]: (r["mean_loss"], r["weight"])
        for r in doremi_weights(df, "lang", "loss", rounds=3, eta=1.0).collect()
    }
    # independent replay from first principles
    by_d = {"en": [1.0, 2.0, 3.0], "de": [4.0, 6.0], "fr": [0.5]}
    means = {
        d: sum(math.floor(v * 1e6 + 0.5) for v in vs) / (len(vs) * 1e6)
        for d, vs in by_d.items()
    }
    f = {d: math.floor(math.exp(means[d]) * 1e6 + 0.5) for d in by_d}
    w = {d: 1_000_000 // 3 for d in by_d}
    for _ in range(3):
        raw = {d: w[d] * f[d] for d in w}
        t = sum(raw.values())
        w = {d: (raw[d] * 1_000_000) // t for d in w}
    want = {d: (means[d], w[d] / 1e6) for d in by_d}
    assert got == want
    # invariants: floor-normalized sum <= 1; loss order = weight order
    assert sum(v[1] for v in got.values()) <= 1.0
    assert got["de"][1] > got["en"][1] > got["fr"][1]
    # rounds=0 -> uniform thirds
    uni = {
        r["lang"]: r["weight"]
        for r in doremi_weights(df, "lang", "loss", rounds=0).collect()
    }
    assert all(v == 0.333333 for v in uni.values())
    import pytest as _pytest

    with _pytest.raises(ValueError):
        doremi_weights(df, "lang", "loss", rounds=-1)
    empty = spark.createDataFrame([], "lang string, loss double")
    with _pytest.raises(ValueError, match="no rows"):
        doremi_weights(empty, "lang", "loss")


def _ref_cms(values, width, depth, salt="cms"):
    """Pure-Python replay of cms_sketch's counter contract."""
    import hashlib

    ctr: dict = {}
    for v in values:
        for j in range(depth):
            p = (
                int(
                    hashlib.md5((str(v) + salt + str(j)).encode()).hexdigest()[:13],
                    16,
                )
                % width
            )
            ctr[(j, p)] = ctr.get((j, p), 0) + 1
    return ctr


def test_cms_sketch_matches_replay_and_one_sided(spark):
    from pipz_spark.datapipe import cms_lookup, cms_merge, cms_sketch

    vals = [f"w{i % 17}" for i in range(300)] + ["hot"] * 50
    df = spark.createDataFrame([(v,) for v in vals], "t string")
    # tiny width forces collisions: the replay must still match and
    # the estimate must stay one-sided (est >= true, never under)
    for width, depth in [(8, 2), (1024, 3)]:
        sk = cms_sketch(df, "t", width=width, depth=depth)
        got = {
            (r["cms_row"], r["cms_pos"]): r["cms_count"] for r in sk.collect()
        }
        assert got == _ref_cms(vals, width, depth)
        probes = spark.createDataFrame(
            [("hot",), ("w3",), ("absent",)], "t string"
        )
        est = {
            r["t"]: r["cms_est"]
            for r in cms_lookup(sk, probes, "t", width=width, depth=depth).collect()
        }
        true = {"hot": 50, "w3": len([v for v in vals if v == "w3"]), "absent": 0}
        for t, n in true.items():
            assert est[t] >= n, (width, t, est[t], n)
        if width == 1024:  # no collisions at this width/corpus
            assert est == true
    # merge law: sketch(parts) summed == sketch(whole)
    a = spark.createDataFrame([(v,) for v in vals[:100]], "t string")
    b = spark.createDataFrame([(v,) for v in vals[100:]], "t string")
    merged = cms_merge(
        cms_sketch(a, "t", width=64, depth=2).unionByName(
            cms_sketch(b, "t", width=64, depth=2)
        )
    )
    whole = cms_sketch(df, "t", width=64, depth=2)
    got_m = {(r["cms_row"], r["cms_pos"]): r["cms_count"] for r in merged.collect()}
    got_w = {(r["cms_row"], r["cms_pos"]): r["cms_count"] for r in whole.collect()}
    assert got_m == got_w
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cms_sketch(df, "t", width=0)


def _ref_pca(ids_vecs, iters, q=10_000):
    """Pure-Python replay of pca_project's integer contract."""
    import math

    xq = {i: [math.floor(v * q + 0.5) for v in vec] for i, vec in ids_vecs}
    d = len(next(iter(xq.values())))
    a = [[0] * d for _ in range(d)]
    for v in xq.values():
        for i in range(d):
            for j in range(d):
                a[i][j] += v[i] * v[j]
    k = [1_000_000] * d
    for _ in range(iters):
        w = [sum(a[i][j] * k[j] for j in range(d)) for i in range(d)]
        s = max(abs(x) for x in w)
        if s == 0:
            break
        # truncating division (SQL DIV semantics), not Python floor
        k = [(abs(wi) * 1_000_000 // s) * (1 if wi >= 0 else -1) for wi in w]
    out = {}
    for i, v in xq.items():
        pq = sum(v[t] * k[t] for t in range(d))
        out[i] = (pq, pq / (q * 1e6))
    return out


def test_pca_project_matches_replay_and_finds_dominant_direction(spark):
    from pipz_spark.datapipe import pca_project

    # data with a designed dominant direction: spread along (3,4,0)
    # with small noise off-axis; after 3 power steps the projection
    # must order the points by their position along that axis
    pts = [(i, [3.0 * t, 4.0 * t, 0.01 * ((i * 7) % 5 - 2)])
           for i, t in enumerate([-2.0, -1.0, -0.5, 0.5, 1.0, 2.0])]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["pc1_q"], r["pc1"])
        for r in pca_project(df, iters=3).collect()
    }
    assert got == _ref_pca(pts, 3)
    # dominant-direction sanity: projections are monotone in t
    order = [i for i, _ in sorted(got.items(), key=lambda kv: kv[1][1])]
    assert order == [0, 1, 2, 3, 4, 5] or order == [5, 4, 3, 2, 1, 0]
    # partition invariance (integer sums)
    again = {
        r["vec_id"]: (r["pc1_q"], r["pc1"])
        for r in pca_project(df.repartition(4), iters=3).collect()
    }
    assert again == got
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mixed dimensionalities"):
        pca_project(
            spark.createDataFrame(
                [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
                "vec_id long, embedding array<double>",
            )
        ).collect()
    with _pytest.raises(ValueError):
        pca_project(df, iters=-1)


def test_pca_gram_overflow_guard(spark):
    """r13 ADVICE: unnormalized embeddings whose quantized
    coordinates would wrap the int64 Gram fold must RAISE in the
    task, not silently corrupt the scatter matrix."""
    from pyspark.errors import PythonException

    from pipz_spark.datapipe import pca_project

    # |x| = 1e6 at coord_quant=1e4 → xq = 1e10, xq² ≈ 1e20 > 2^62
    df = spark.createDataFrame(
        [(1, [1.0e6, 2.0e6]), (2, [1.5e6, 0.5e6])],
        "vec_id long, embedding array<double>",
    )
    import pytest as _pytest

    with _pytest.raises(PythonException, match="exceed int64"):
        pca_project(df, iters=1).collect()


def test_cms_weighted_mass(spark):
    """weight_col switches the sketch to exact weighted mass: the
    counters equal the Python replay with each key contributing its
    weight, lookups stay one-sided, and NULL weights count zero."""
    from pipz_spark.datapipe import cms_lookup, cms_sketch

    rows = [("web", 100), ("web", 250), ("code", 40), ("books", None)]
    df = spark.createDataFrame(rows, "src string, n_tokens long")
    sk = cms_sketch(df, "src", width=1024, depth=3, weight_col="n_tokens")
    got = {(r["cms_row"], r["cms_pos"]): r["cms_count"] for r in sk.collect()}
    import hashlib

    want: dict = {}
    for src, w in rows:
        for j in range(3):
            p = (
                int(hashlib.md5((src + "cms" + str(j)).encode()).hexdigest()[:13], 16)
                % 1024
            )
            want[(j, p)] = want.get((j, p), 0) + (w or 0)
    assert got == want
    probes = spark.createDataFrame([("web",), ("books",)], "src string")
    est = {
        r["src"]: r["cms_est"]
        for r in cms_lookup(sk, probes, "src", width=1024, depth=3).collect()
    }
    assert est["web"] >= 350 and est["books"] >= 0


def test_cms_negative_weight_rejected_and_probes_dedup(spark):
    """r13 ADVICE: a negative weight voids the one-sided guarantee —
    the plan must RAISE, not silently sketch; fractional weights
    truncate toward zero per the documented BIGINT cast; duplicate
    probe rows collapse to one output row (the documented distinct
    contract)."""
    from pyspark.errors import SparkRuntimeException

    from pipz_spark.datapipe import cms_lookup, cms_sketch

    bad = spark.createDataFrame(
        [("web", 10), ("code", -3)], "src string, n_tokens long"
    )
    import pytest as _pytest

    with _pytest.raises(SparkRuntimeException, match="negative weight"):
        cms_sketch(bad, "src", width=64, depth=2, weight_col="n_tokens").collect()

    frac = spark.createDataFrame(
        [("web", 2.9), ("web", 0.4)], "src string, n_tokens double"
    )
    sk = cms_sketch(frac, "src", width=64, depth=1, weight_col="n_tokens")
    assert {r["cms_count"] for r in sk.collect()} == {2}  # 2.9→2, 0.4→0

    ok = spark.createDataFrame([("web", 5)], "src string, n_tokens long")
    sk2 = cms_sketch(ok, "src", width=64, depth=2, weight_col="n_tokens")
    dup_probes = spark.createDataFrame(
        [("web",), ("web",), ("x",)], "src string"
    )
    out = cms_lookup(sk2, dup_probes, "src", width=64, depth=2).collect()
    assert sorted(r["src"] for r in out) == ["web", "x"]


# ---- r14: examples run in CI (verdict asks #4/#8) -----------------


def test_doremi_mixture_example(spark):
    """The DoReMi recipe example (cms token mass -> doremi_weights ->
    mixture_resample) runs end to end at sf0.001 and its audit holds:
    weights are a sub-probability vector, the resample only removes
    mass, and every surviving domain's token mass shrank or held."""
    import sys

    sys.path.insert(0, "/root/repo/examples")
    try:
        from doremi_mixture import main
    finally:
        sys.path.pop(0)

    out = main("/root/testdata/sf0.001", spark=spark)
    assert out["n_after"] <= out["n_before"] and out["n_after"] > 0
    w = out["weights"]
    assert w and all(v >= 0 for v in w.values()) and sum(w.values()) <= 1.0 + 1e-9
    for lang, est in out["mass_after"].items():
        assert est <= out["mass_before"][lang]


def test_incremental_sketches_example(spark, tmp_path):
    """Per-day sketches persisted then merged equal the direct sketch
    (the example asserts register/counter bit-identity itself); the
    month-wide answers come back non-degenerate."""
    import sys

    sys.path.insert(0, "/root/repo/examples")
    try:
        from incremental_sketches import main
    finally:
        sys.path.pop(0)

    out = main("/root/testdata/sf0.001", spark=spark, store_dir=str(tmp_path))
    assert out["days"] >= 1
    assert out["month_users"] > 0
    assert out["traffic"] and all(v > 0 for v in out["traffic"].values())


def test_image_dedup_example(spark):
    """The multimodal dedup flow end to end: banded aHash pairs feed
    the cluster/keeper machinery, pairs never straddle clusters (the
    example asserts this itself), and the planted variants actually
    collapse (kept < payloads)."""
    import sys

    sys.path.insert(0, "/root/repo/examples")
    try:
        from image_dedup import main
    finally:
        sys.path.pop(0)

    out = main("/root/testdata/sf0.001", spark=spark)
    assert out["payloads"] > 0
    assert out["pairs"] > 0, "the planted variants must produce pairs"
    assert out["kept"] < out["payloads"]


# ---- r14: triangle counting / label propagation -------------------


def _ref_triangles(edge_pairs):
    """Brute-force per-node triangle counts (simple undirected graph)."""
    und = {frozenset((u, v)) for u, v in edge_pairs if u != v}
    adj: dict = {}
    for e in und:
        u, v = tuple(e)
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    from itertools import combinations

    counts: dict = {}
    nodes = sorted(adj)
    for a, b, c in combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def _ref_minlabels(edge_pairs, iters):
    """Synchronous min-label propagation replay."""
    adj: dict = {}
    for u, v in edge_pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    lab = {n: n for n in adj}
    for _ in range(iters):
        lab = {
            n: min([lab[n]] + [lab[m] for m in adj[n]]) for n in adj
        }
    return lab


def test_triangle_count_matches_bruteforce(spark):
    from pipz_spark.datapipe import triangle_count

    # K4 + pendant + a separate triangle sharing no nodes; edges fed
    # messy: both directions, duplicates, a self-loop
    pairs = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
        ("c", "d"), ("d", "e"), ("b", "a"), ("x", "y"), ("y", "z"),
        ("z", "x"), ("x", "x"), ("y", "z"),
    ]
    df = spark.createDataFrame(pairs, "src string, dst string")
    got = {r["node"]: r["triangles"] for r in triangle_count(df).collect()}
    assert got == _ref_triangles(pairs)
    # partition invariance
    again = {
        r["node"]: r["triangles"]
        for r in triangle_count(df.repartition(7)).collect()
    }
    assert again == got


def test_triangle_count_bipartite_is_empty(spark):
    """A bipartite graph has no triangles — the customer↔supplier
    purchase graph shape must count zero everywhere."""
    from pipz_spark.datapipe import triangle_count

    pairs = [(f"c{i}", f"s{j}") for i in range(4) for j in range(3)]
    df = spark.createDataFrame(pairs, "src string, dst string")
    assert triangle_count(df).count() == 0


def test_propagate_min_labels_matches_replay(spark):
    from pipz_spark.datapipe import propagate_min_labels

    pairs = [("b", "c"), ("c", "d"), ("p", "q"), ("x", "b")]
    df = spark.createDataFrame(pairs, "src string, dst string")
    for iters in (0, 1, 2, 4):
        got = {
            r["node"]: r["label"]
            for r in propagate_min_labels(df, iters=iters).collect()
        }
        assert got == _ref_minlabels(pairs, iters)
    # diameter reached -> labels are connected components
    got = {
        r["node"]: r["label"]
        for r in propagate_min_labels(df, iters=4, checkpoint_every=2).collect()
    }
    assert got == {"b": "b", "c": "b", "d": "b", "x": "b", "p": "p", "q": "p"}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        propagate_min_labels(df, iters=-1)
    with _pytest.raises(ValueError):
        propagate_min_labels(df, checkpoint_every=0)


# ---- r14: winnowing fingerprints ----------------------------------


def _ref_winnow(text, k=3, w=4, salt="win"):
    """Pure-Python replay of robust winnowing over word k-grams."""
    import hashlib

    toks = [t for t in (text or "").strip().lower().split() if t]
    if not toks:
        return set()
    ng = max(len(toks) - k + 1, 1)
    hs = [
        int(
            hashlib.md5(
                (" ".join(toks[i - 1 : i - 1 + k]) + salt).encode()
            ).hexdigest()[:13],
            16,
        )
        for i in range(1, ng + 1)
    ]
    sel = set()
    for s in range(1, max(len(hs) - w + 1, 1) + 1):
        win = hs[s - 1 : s - 1 + w]
        mn = min(win)
        rj = max(j + 1 for j, h in enumerate(win) if h == mn)
        sel.add((mn, s + rj - 1))
    return sel


def test_winnow_matches_replay_and_guarantee(spark):
    from pipz_spark.datapipe import winnow_fingerprints

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "completely different text with no overlap here at all friend"),
        (3, "xx yy the quick brown fox jumps over the lazy dog zz"),
        (4, "ab"),
        (5, "  "),
        (6, None),
        (7, "one two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict = {}
    for r in winnow_fingerprints(df, k=3, w=4).collect():
        got.setdefault(r["doc_id"], set()).add((r["fp_hash"], r["fp_pos"]))
    for did, text in rows:
        if text is None or not text.strip():
            assert did not in got  # blank docs excluded
        else:
            assert got[did] == _ref_winnow(text), did
    # the winnowing guarantee: docs 1 and 3 share a 9-token run
    # (>= w + k - 1 = 6) so they MUST share a fingerprint hash;
    # disjoint docs share none
    h = lambda d: {fh for fh, _ in got[d]}
    assert h(1) & h(3)
    assert not (h(1) & h(2))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)
    with _pytest.raises(ValueError):
        winnow_fingerprints(df, w=0)


def test_winnow_density(spark):
    """Expected selected density ~ 2/(w+1) of grams (the paper's
    bound); on real corpus text the realized density must sit well
    below 1 and above the w-th fraction — the 'index got smaller'
    contract that motivates winnowing at all."""
    from pyspark.sql import functions as F

    from pipz_spark.datapipe import winnow_fingerprints

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w = 8
    fps = winnow_fingerprints(docs, k=3, w=w).count()
    grams = docs.select(
        F.greatest(
            F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")) - F.lit(2),
            F.lit(1),
        ).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    density = fps / grams
    assert 1.0 / w <= density <= 4.0 / (w + 1), (density, fps, grams)


def test_winnow_overlap_df_cap_bounds_boilerplate_fanout(spark):
    """The df-cap property on a DESIGNED boilerplate corpus: every
    train and eval doc shares one boilerplate sentence, so uncapped
    the fp_hash join fans out to |train| × |eval| pairs (the chance-
    collision explosion the dedup family's cap exists for); capped,
    the boilerplate prints are dropped and only the one TRUE
    overlapping pair (a long unique shared run) survives, with the
    candidate volume provably bounded at cap × |eval print rows|."""
    from pipz_spark.datapipe import winnow_fingerprints, winnow_overlap

    boiler = "this site uses cookies to improve your browsing experience today"
    run = "orbital mechanics of the restricted three body problem near lagrange points"
    train_rows = [
        (i, f"{boiler} train unique alpha{i} beta{i} gamma{i} delta{i}")
        for i in range(40)
    ] + [(999, f"{run} train tail words here")]
    eval_rows = [
        (1000 + j, f"{boiler} eval unique eps{j} zeta{j} eta{j} theta{j}")
        for j in range(8)
    ] + [(1999, f"prefix words then {run}")]
    tdf = spark.createDataFrame(train_rows, "doc_id long, text string")
    edf = spark.createDataFrame(eval_rows, "doc_id long, text string")
    tf = winnow_fingerprints(tdf, k=3, w=4).select(
        F.col("doc_id").alias("train_id"), "fp_hash"
    )
    ef = winnow_fingerprints(edf, k=3, w=4).select(
        F.col("doc_id").alias("eval_id"), "fp_hash"
    )
    cap = 8
    capped = winnow_overlap(tf, ef, min_shared=1, max_doc_freq=cap).collect()
    # boilerplate (train df = 40 > cap) no longer bridges pairs; the
    # true pair's unique ≥ w+k−1 run still surfaces (the guarantee)
    assert {(r["train_id"], r["eval_id"]) for r in capped} == {(999, 1999)}
    uncapped = winnow_overlap(
        tf, ef, min_shared=1, max_doc_freq=10**9
    ).count()
    assert uncapped >= 40 * 8  # the explosion the cap prevents
    # candidate bound: per kept print, train fan-out ≤ cap, so the
    # join output is ≤ cap × (eval print rows) — assert the realized
    # capped candidate volume honors it while the uncapped one breaks
    # the same bound (i.e. the cap is what bounds it)
    t = tf.distinct()
    e = ef.distinct()
    keep = (
        t.groupBy("fp_hash")
        .agg(F.count(F.lit(1)).alias("_df"))
        .where(F.col("_df") <= cap)
        .select("fp_hash")
    )
    capped_cands = t.join(keep, "fp_hash").join(e, "fp_hash").count()
    uncapped_cands = t.join(e, "fp_hash").count()
    e_rows = e.count()
    assert capped_cands <= cap * e_rows
    assert uncapped_cands > cap * e_rows
    import pytest as _pytest

    with _pytest.raises(ValueError):
        winnow_overlap(tf, ef, min_shared=0)
    with _pytest.raises(ValueError):
        winnow_overlap(tf, ef, max_doc_freq=0)


# ---- r14: JL projection / HLL set algebra / blocklist -------------


def test_jl_project_matches_replay(spark):
    import math

    from pipz_spark.datapipe import jl_project, jl_signs

    rows = [(1, [0.5, -0.25, 1.0]), (2, [0.1, 0.2, 0.3]), (3, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["vec_id"], r["jl_dim"]): r["jl_q"]
        for r in jl_project(df, d_out=4).collect()
    }
    signs = jl_signs(3, 4)
    want = {}
    for vid, vec in [(1, [0.5, -0.25, 1.0]), (2, [0.1, 0.2, 0.3])]:
        xq = [math.floor(x * 10000 + 0.5) for x in vec]
        for j in range(4):
            want[(vid, j)] = sum(x * s for x, s in zip(xq, signs[j]))
    assert got == want
    # partition invariance (pure projection, but assert anyway)
    again = {
        (r["vec_id"], r["jl_dim"]): r["jl_q"]
        for r in jl_project(df.repartition(3), d_out=4).collect()
    }
    assert again == got
    import pytest as _pytest

    with _pytest.raises(ValueError):
        jl_project(df, d_out=0)
    with _pytest.raises(ValueError, match="mixed"):
        jl_project(
            spark.createDataFrame(
                [(1, [1.0]), (2, [1.0, 2.0])], "vec_id long, embedding array<double>"
            )
        ).collect()


def test_jl_project_preserves_distances_roughly(spark):
    """The JL point: pairwise distances in the projected space track
    the originals. With d_out=16 over 64-dim unit-ish vectors the
    Achlioptas bound gives ~50% distortion w.h.p. — assert ratios
    stay within a loose band (deterministic: fixed signs, fixed
    data)."""
    import math
    import random

    from pipz_spark.datapipe import jl_project

    rng = random.Random(7)
    vecs = {
        i: [rng.uniform(-1, 1) for _ in range(64)] for i in range(8)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    d_out = 16
    proj: dict = {}
    for r in jl_project(df, d_out=d_out).collect():
        proj.setdefault(r["vec_id"], {})[r["jl_dim"]] = r["jl_q"]
    q = 10000.0

    def dist_orig(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(vecs[a], vecs[b])))

    def dist_proj(a, b):
        # E[|Px - Py|^2] = d_out * |x-y|^2 for +-1 entries
        return math.sqrt(
            sum((proj[a][j] - proj[b][j]) ** 2 for j in range(d_out))
        ) / (q * math.sqrt(d_out))

    ratios = [
        dist_proj(a, b) / dist_orig(a, b)
        for a in vecs
        for b in vecs
        if a < b
    ]
    assert all(0.4 <= r <= 1.8 for r in ratios), ratios


def test_hll_intersect_estimate(spark):
    """Inclusion-exclusion overlap: on sets with a known overlap the
    estimate lands within the compounded HLL error; the union sketch
    must equal max-merged registers (the derivation IS hll_merge)."""
    from pipz_spark.datapipe import (
        hll_intersect_estimate,
        hll_merge,
        hll_sketch,
    )

    rows = (
        [("a", v) for v in range(2000)]
        + [("b", v) for v in range(1500, 3500)]
    )
    df = spark.createDataFrame(rows, "part string, val long")
    out = hll_intersect_estimate(df, "val", "part", "a", "b", b=12).collect()[0]
    # true: |A|=2000 |B|=2000 |A∩B|=500 |A∪B|=3500; b=12 → ~1.6% se,
    # overlap compounds three estimates — allow ±25% of the overlap
    assert abs(out["hll_a"] - 2000) < 2000 * 0.06
    assert abs(out["hll_b"] - 2000) < 2000 * 0.06
    assert abs(out["hll_union"] - 3500) < 3500 * 0.06
    assert abs(out["hll_overlap"] - 500) < 500 * 0.5
    assert out["hll_overlap"] == out["hll_a"] + out["hll_b"] - out["hll_union"]
    # union registers == max-merge of the part registers
    regs = hll_sketch(
        df.select(
            F.when(F.col("part") == "a", "a").otherwise("b").alias("_g"), "val"
        ),
        "val",
        ["_g"],
        b=12,
    )
    merged = {
        r["hll_bucket"]: r["hll_rho"] for r in hll_merge(regs).collect()
    }
    direct = {
        r["hll_bucket"]: r["hll_rho"]
        for r in hll_sketch(df, "val", b=12).collect()
    }
    assert merged == direct


def test_hll_intersect_empty_partition_single_row(spark):
    """The ONE-row contract holds when a part (or both) has no rows:
    an empty part estimates 0 distinct, never an empty result frame
    (r14 ADVICE regression — the old where+crossJoin shape collapsed
    the whole result to zero rows)."""
    from pipz_spark.datapipe import hll_intersect_estimate

    rows = [("a", v) for v in range(100)]
    df = spark.createDataFrame(rows, "part string, val long")
    out = hll_intersect_estimate(df, "val", "part", "a", "b", b=8).collect()
    assert len(out) == 1
    r = out[0]
    assert r["hll_b"] == 0.0
    assert abs(r["hll_a"] - 100) < 15
    assert r["hll_overlap"] == r["hll_a"] + r["hll_b"] - r["hll_union"]
    empty = hll_intersect_estimate(
        df.where("part = 'zzz'"), "val", "part", "a", "b", b=8
    ).collect()
    assert len(empty) == 1
    assert empty[0]["hll_a"] == 0.0
    assert empty[0]["hll_b"] == 0.0
    assert empty[0]["hll_union"] == 0.0


def _ref_kll_build(values, k):
    """Canonical-compaction replay: keep sorted ranks 1, s+1, …, n."""
    sv = sorted(values)
    n = len(sv)
    s = (n + k - 1) // k
    return sorted(
        (sv[r - 1], 1 if r == 1 else s if (r - 1) % s == 0 else (n - 1) % s)
        for r in range(1, n + 1)
        if (r - 1) % s == 0 or r == n
    )


def test_kll_sketch_engine_exact_and_partition_invariant(spark):
    """The build sketch is a PURE FUNCTION of the value multiset:
    bit-identical to the Python replay of the canonical even-rank
    compaction, invariant under repartitioning, Σ weights = n (the
    cum-weight-equals-exact-rank invariant), ≤ k+1 rows."""
    import random

    from pipz_spark.datapipe import kll_sketch

    random.seed(11)
    vals = [float(random.randint(0, 10**6)) for _ in range(997)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v double"
    )
    k = 16
    got = sorted(
        (r["kll_value"], r["kll_weight"])
        for r in kll_sketch(df, "v", [], k=k, id_col="id").collect()
    )
    assert got == _ref_kll_build(vals, k)
    assert sum(w for _, w in got) == len(vals)
    assert len(got) <= k + 1
    got2 = sorted(
        (r["kll_value"], r["kll_weight"])
        for r in kll_sketch(df.repartition(13), "v", [], k=k, id_col="id").collect()
    )
    assert got2 == got
    # grouped build replays per group independently
    gdf = df.withColumn("g", (F.col("id") % 2).cast("string"))
    gsk = kll_sketch(gdf, "v", ["g"], k=k, id_col="id")
    per: dict = {}
    for r in gsk.collect():
        per.setdefault(r["g"], []).append((r["kll_value"], r["kll_weight"]))
    for gval in ("0", "1"):
        ref = _ref_kll_build(
            [v for i, v in enumerate(vals) if i % 2 == int(gval)], k
        )
        assert sorted(per[gval]) == ref, gval
    import pytest as _pytest

    with _pytest.raises(ValueError):
        kll_sketch(df, "v", [], k=0)


def test_kll_merge_and_quantile_error_bounds(spark):
    """Quantile answers respect the published rank-error bounds:
    build ≤ ceil(n/k); merged day-sketches ≤ part-build error +
    merge stride (the MRL additive composition). Merge preserves
    total weight exactly and re-compacts to ≤ k+1 rows."""
    import bisect
    import random

    from pipz_spark.datapipe import kll_merge, kll_quantile, kll_sketch

    random.seed(13)
    vals = [float(random.randint(0, 10**6)) for _ in range(1200)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v double"
    )
    k = 16
    sv = sorted(vals)
    n = len(sv)
    s_build = (n + k - 1) // k
    sk = kll_sketch(df, "v", [], k=k, id_col="id")
    for r in kll_quantile(sk, [(1, 4), (1, 2), (3, 4), (1, 1)], []).collect():
        phi, v = r["q"], r["kll_quantile"]
        lo = bisect.bisect_left(sv, v) + 1
        hi = bisect.bisect_right(sv, v)
        err = min(abs(lo - phi * n), abs(hi - phi * n))
        assert err <= s_build, (phi, v, err, s_build)
        assert r["kll_n"] == n
    # 3-way split → build each → merge → query
    parts = [df.where(F.col("id") % 3 == i) for i in range(3)]
    u = None
    for p in parts:
        skp = kll_sketch(p, "v", [], k=k, id_col="id")
        u = skp if u is None else u.unionByName(skp)
    merged = kll_merge(u, [], k=k)
    rows = merged.collect()
    assert sum(r["kll_weight"] for r in rows) == n
    assert len(rows) <= k + 1
    # the MRL composition is ADDITIVE over parts: each part's build
    # contributes up to its own stride of rank error, so the sound
    # bound is Σ_p ceil(n_p/k) + the merge stride ceil(W/k) — NOT
    # max-over-parts (a distribution whose per-part truncations
    # align can legitimately exceed that)
    part_s_sum = sum(
        (c + k - 1) // k
        for c in [len(vals) // 3 + (1 if len(vals) % 3 > i else 0) for i in range(3)]
    )
    merge_s = (n + k - 1) // k
    for r in kll_quantile(merged, [(1, 2), (19, 20)], []).collect():
        phi, v = r["q"], r["kll_quantile"]
        lo = bisect.bisect_left(sv, v) + 1
        hi = bisect.bisect_right(sv, v)
        err = min(abs(lo - phi * n), abs(hi - phi * n))
        assert err <= part_s_sum + merge_s, (phi, v, err)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        kll_quantile(sk, [])
    with _pytest.raises(ValueError):
        kll_quantile(sk, [(3, 2)])
    with _pytest.raises(ValueError):
        kll_merge(u, [], k=-1)


def test_readability_scores_match_replay(spark):
    """Flesch / FK-grade replay on designed docs: the pinned counting
    conventions (WS words, terminator-run sentences floored at 1,
    vowel-group syllables floored at n_words) and the quantized IEEE
    chains reproduce a pure-Python evaluation exactly; empty docs
    are excluded."""
    import math
    import re

    from pipz_spark.datapipe import readability_scores

    rows = [
        (1, "The cat sat on the mat. It was happy!"),
        (2, "no terminal punctuation here at all"),
        (3, "Incomprehensibility characterizes extraordinarily convoluted documentation."),
        (4, ""),
        (5, None),
        (6, "Why? Because. Exactly!"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_words"], r["n_sentences"], r["n_syllables"],
            r["flesch"], r["fk_grade"],
        )
        for r in readability_scores(df).collect()
    }
    assert 4 not in got and 5 not in got
    for did, text in rows:
        if not text:
            continue
        w = len([t for t in re.split(r"[ \t\n\f\r]+", text.strip()) if t])
        s = max(len(re.findall(r"[.!?]+", text)), 1)
        y = max(len(re.findall(r"[aeiouy]+", text.lower())), w)
        fl = math.floor((206.835 - 1.015 * (w / s) - 84.6 * (y / w)) * 1e4 + 0.5) / 1e4
        fk = math.floor((0.39 * (w / s) + 11.8 * (y / w) - 15.59) * 1e4 + 0.5) / 1e4
        assert got[did] == (w, s, y, fl, fk), did
    # the signal points the right way: the polysyllabic doc reads
    # harder than the simple one
    assert got[3][3] < got[1][3]
    assert got[3][4] > got[1][4]


def test_kll_from_weighted_bounded_domain_path(spark):
    """The histogram fast path: on a distinct-value multiset it is
    ROW-IDENTICAL to the rank-machine build (same canonical
    compaction); on a weighted histogram it preserves total weight,
    stays ≤ k+1 rows, answers within the single-compaction bound,
    and drops non-positive weights."""
    import bisect
    import random

    from pipz_spark.datapipe import kll_from_weighted, kll_quantile, kll_sketch

    random.seed(17)
    vals = random.sample(range(10**7), 800)  # distinct
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, v double"
    )
    k = 16
    build = sorted(
        (r["kll_value"], r["kll_weight"])
        for r in kll_sketch(df, "v", [], k=k, id_col="id").collect()
    )
    hist = df.select("v", F.lit(1).alias("w"))
    fast = sorted(
        (r["kll_value"], r["kll_weight"])
        for r in kll_from_weighted(hist, "v", "w", [], k=k).collect()
    )
    assert fast == build
    # weighted histogram: lengths 1..100 with weight = length*3
    hrows = [(float(v), v * 3) for v in range(1, 101)] + [(5.0, 0), (None, 9)]
    hdf = spark.createDataFrame(hrows, "v double, w long")
    sk = kll_from_weighted(hdf, "v", "w", [], k=k)
    rows = sk.collect()
    W = sum(v * 3 for v in range(1, 101))
    assert sum(r["kll_weight"] for r in rows) == W
    assert len(rows) <= k + 1
    expanded = sorted(
        x for v in range(1, 101) for x in [float(v)] * (v * 3)
    )
    s = (W + k - 1) // k
    for r in kll_quantile(sk, [(1, 2), (9, 10)], []).collect():
        phi, v = r["q"], r["kll_quantile"]
        lo = bisect.bisect_left(expanded, v) + 1
        hi = bisect.bisect_right(expanded, v)
        err = min(abs(lo - phi * W), abs(hi - phi * W))
        assert err <= s, (phi, v, err, s)


def test_blocklist_report(spark):
    from pipz_spark.datapipe import blocklist_report

    rows = [
        (1, "the Slow lazy dog"),        # 'slow' case-insensitive hit
        (2, "clean text only"),
        (3, "slow slow spill"),          # distinct hits: slow, spill
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_blocked"], r["keep"])
        for r in blocklist_report(df, ["slow", "SPILL", "absent"]).collect()
    }
    assert got == {
        1: (1, False),
        2: (0, True),
        3: (2, False),
        4: (0, True),
        5: (0, True),
    }
    import pytest as _pytest

    with _pytest.raises(ValueError):
        blocklist_report(df, [])


def test_near_dup_graph_example(spark):
    """The graph-over-pair-graph example runs end to end at sf0.001;
    its own internal assertion (Pregel labels == union-find clusters)
    is the load-bearing check."""
    import sys

    sys.path.insert(0, "/root/repo/examples")
    try:
        from near_dup_graph_analysis import main
    finally:
        sys.path.pop(0)

    out = main("/root/testdata/sf0.001", spark=spark)
    assert out["n_pairs"] > 0
    assert out["n_keepers"] == out["n_clusters"] > 0
    assert 0 < out["dense_docs"] <= out["n_pairs"] * 3
    # every triangle-closing doc has degree >= 2, so the 2-core
    # contains at least the dense docs
    assert out["n_core"] >= out["dense_docs"]
    # LPA refines components; keeper BFS covered every clustered doc
    # (both asserted inside main), and the chain depth is bounded by
    # the BFS budget
    assert out["n_communities"] >= out["n_clusters"]
    assert 0 <= out["max_chain_depth"] <= 12


def _ref_token_entropy(text):
    import math
    from collections import Counter

    toks = [t for t in (text or "").strip().lower().split() if t]
    if not toks:
        return (0, 0, None)
    c = Counter(toks)
    n = len(toks)
    lnq = lambda x: math.floor(math.log(x) * 1e6 + 0.5)
    num = n * lnq(n) - sum(v * lnq(v) for v in c.values())
    return (n, len(c), num / (n * 1e6))


def test_token_entropy_matches_replay(spark):
    from pipz_spark.datapipe import token_entropy

    rows = [
        (1, "a a a a"),          # fully repetitive: 0 nats
        (2, "a b c d"),          # uniform: ln 4
        (3, "a a b b"),          # ln 2
        (4, ""),
        (5, None),
        (6, "the The THE spam spam x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_distinct"], r["entropy"])
        for r in token_entropy(df).collect()
    }
    for did, text in rows:
        assert got[did] == _ref_token_entropy(text), did
    # the signal's point: repetition sorts below diversity
    assert got[1][2] < got[3][2] < got[2][2]
    # universe rule: blank docs present with NULL entropy
    assert got[4] == (0, 0, None) and got[5] == (0, 0, None)


def test_winnow_overlap_guarantee(spark):
    """Joining two corpora's winnow fingerprints finds every pair
    sharing >= w+k-1 consecutive tokens — the MOSS composition the
    dp_winnow_overlap query gates on real data."""
    from pipz_spark.datapipe import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 >= 4+3-1
    train = spark.createDataFrame(
        [(1, f"intro words {shared} trailing bits"),
         (2, "completely unrelated training text with other words")],
        "doc_id long, text string",
    )
    evald = spark.createDataFrame(
        [(100, f"different framing {shared} other ending")],
        "doc_id long, text string",
    )
    tf = winnow_fingerprints(train, k=3, w=4).select(
        F.col("doc_id").alias("train_id"), "fp_hash"
    )
    ef = winnow_fingerprints(evald, k=3, w=4).select(
        F.col("doc_id").alias("eval_id"), "fp_hash"
    ).distinct()
    hits = {
        (r["train_id"], r["eval_id"])
        for r in tf.join(ef, "fp_hash").select("train_id", "eval_id").distinct().collect()
    }
    assert (1, 100) in hits
    assert (2, 100) not in hits


def _ref_kcore(edge_pairs, k, rounds):
    """Synchronous peel replay: drop deg<k nodes each round."""
    und = {frozenset((u, v)) for u, v in edge_pairs if u != v}
    edges = {tuple(sorted(e)) for e in und}
    for _ in range(rounds):
        deg: dict = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {n for n, c in deg.items() if c >= k}
        edges = {(u, v) for u, v in edges if u in keep and v in keep}
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    return deg


def test_kcore_peel_matches_replay(spark):
    from pipz_spark.datapipe import kcore_peel

    # K4 + a chain hung off it: the 3-core is exactly the K4, found
    # after one peel round and stable after
    pairs = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
        ("c", "d"), ("d", "e"), ("e", "f"), ("b", "a"), ("a", "a"),
    ]
    df = spark.createDataFrame(pairs, "src string, dst string")
    for rounds in (0, 1, 3):
        got = {
            r["node"]: r["degree"]
            for r in kcore_peel(df, k=3, rounds=rounds).collect()
        }
        assert got == _ref_kcore(pairs, 3, rounds), rounds
    assert set(kcore_peel(df, k=3, rounds=1).toPandas()["node"]) == {
        "a", "b", "c", "d"
    }
    import pytest as _pytest

    with _pytest.raises(ValueError):
        kcore_peel(df, k=-1)
    with _pytest.raises(ValueError):
        kcore_peel(df, k=3, rounds=-1)
    with _pytest.raises(ValueError):
        kcore_peel(df, k=3, checkpoint_every=0)


def _ref_ppr(edge_pairs, iters, seeds, init_q=10**12, num=17, den=20):
    """Personalized-PageRank replay: teleport base only at seeds."""
    nodes = sorted({s for s, _ in edge_pairs} | {d for _, d in edge_pairs})
    deg: dict = {}
    for s, _ in edge_pairs:
        deg[s] = deg.get(s, 0) + 1
    base = (init_q * (den - num)) // den
    rank = {n: (init_q if n in seeds else 0) for n in nodes}
    for _ in range(iters):
        ins: dict = {}
        for s, d in edge_pairs:
            if deg.get(s, 0) > 0:
                ins[d] = ins.get(d, 0) + rank[s] // deg[s]
        rank = {
            n: (base if n in seeds else 0) + (ins.get(n, 0) * num) // den
            for n in nodes
        }
    return {n: (rank[n], deg.get(n, 0)) for n in nodes}


def test_personalized_pagerank_matches_replay(spark):
    """seeds= switches to TrustRank-style personalization: teleport
    mass only at the seed set; non-seeds earn rank solely through
    in-links (zero if unreachable from trust)."""
    from pipz_spark.datapipe import pagerank

    pairs = [
        ("s1", "a"), ("a", "b"), ("b", "a"), ("s1", "b"),
        ("x", "y"), ("y", "x"),  # a 2-cycle unreachable from seeds
    ]
    df = spark.createDataFrame(pairs, "src string, dst string")
    seeds = spark.createDataFrame([("s1",)], "node string")
    got = {
        r["node"]: (r["rank_q"], r["outdeg"])
        for r in pagerank(df, iters=3, seeds=seeds).collect()
    }
    assert got == _ref_ppr(pairs, 3, {"s1"})
    # trust decays with distance; unreachable nodes hold zero
    assert got["x"][0] == 0 and got["y"][0] == 0
    assert got["s1"][0] > 0 and got["a"][0] > 0
    # seeds=None unchanged (the uniform machine)
    uni = {
        r["node"]: (r["rank_q"], r["outdeg"])
        for r in pagerank(df, iters=3).collect()
    }
    assert uni == _ref_pagerank(pairs, 3)


def test_clustering_coefficient_matches_replay(spark):
    """LCC = 2T/(d(d−1)) on a designed graph: a 4-clique (lcc 1.0),
    a bridge node, and a path tail (lcc 0.0, degree<2 nodes pinned
    at 0.0); duplicates/direction/self-loops ignored."""
    import math

    from pipz_spark.datapipe import clustering_coefficient

    pairs = [
        # 4-clique a,b,c,d
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
        ("c", "d"),
        # bridge e: connected to a and b (closes one triangle)
        ("e", "a"), ("b", "e"),
        # tail: f-g (no triangles), plus noise
        ("f", "g"), ("g", "f"), ("f", "f"),
    ]
    df = spark.createDataFrame(pairs, "src string, dst string")
    got = {
        r["node"]: (r["triangles"], r["degree"], r["lcc"])
        for r in clustering_coefficient(df).collect()
    }

    def q4(x):
        return math.floor(x * 1e4 + 0.5) / 1e4

    # a and b: degree 4 (clique + e), triangles: 3 within clique + 1
    # with e = 4 → lcc = 8/12
    assert got["a"] == (4, 4, q4(8 / 12))
    assert got["b"] == (4, 4, q4(8 / 12))
    # c, d: degree 3, all 3 clique triangles → lcc 1.0
    assert got["c"] == (3, 3, 1.0)
    assert got["d"] == (3, 3, 1.0)
    # e: degree 2, one triangle (a, b) → lcc 1.0
    assert got["e"] == (1, 2, 1.0)
    # f, g: degree 1 after canonicalization → lcc 0.0, no triangles
    assert got["f"] == (0, 1, 0.0)
    assert got["g"] == (0, 1, 0.0)
    assert len(got) == 7


def _ref_hits(edge_pairs, iters, norm_every=None, norm_target=10**6):
    """Integer HITS replay: a ← Σ_in h, h ← Σ_out a, hubs start 1."""
    nodes = sorted({s for s, _ in edge_pairs} | {d for _, d in edge_pairs})
    h = {n: 1 for n in nodes}
    a = {n: 0 for n in nodes}
    for it in range(iters):
        a = {n: 0 for n in nodes}
        for s, d in edge_pairs:
            a[d] += h[s]
        h = {n: 0 for n in nodes}
        for s, d in edge_pairs:
            h[s] += a[d]
        if norm_every and (it + 1) % norm_every == 0:
            k = max(max(a.values()), max(h.values())) // norm_target
            if k >= 2:
                a = {n: v // k for n, v in a.items()}
                h = {n: v // k for n, v in h.items()}
    return {n: (a[n], h[n]) for n in nodes}


def test_hits_matches_integer_replay(spark):
    """HITS mutual recursion is integer-exact against a pure-Python
    replay, including the optional norm_every rescale; authorities
    with no in-links and hubs with no out-links hold zero."""
    from pipz_spark.datapipe import hits

    pairs = [
        ("h1", "a1"), ("h1", "a2"), ("h2", "a1"),
        ("h2", "a3"), ("h3", "a1"), ("a1", "a2"),
    ]
    df = spark.createDataFrame(pairs, "src string, dst string")
    for iters in (0, 1, 2, 3):
        got = {
            r["node"]: (r["auth_q"], r["hub_q"])
            for r in hits(df, iters=iters).collect()
        }
        if iters == 0:
            # pre-iteration state: hubs 1, authorities 0
            assert got == {n: (0, 1) for n in got}
        else:
            assert got == _ref_hits(pairs, iters), iters
    # pure-sink node: nonzero authority, zero hub
    two = {
        r["node"]: (r["auth_q"], r["hub_q"])
        for r in hits(df, iters=2).collect()
    }
    assert two["a3"][0] > 0 and two["a3"][1] == 0
    # norm path replays exactly too
    got_n = {
        r["node"]: (r["auth_q"], r["hub_q"])
        for r in hits(df, iters=3, norm_every=1, norm_target=2).collect()
    }
    assert got_n == _ref_hits(pairs, 3, norm_every=1, norm_target=2)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hits(df, iters=-1)
    with _pytest.raises(ValueError):
        hits(df, norm_every=0)
    with _pytest.raises(ValueError):
        hits(df, norm_target=0)


def test_pagerank_tol_early_exit_matches_fixed_iters(spark):
    """tol= stops once the exact L1 rank delta falls to tol; the
    early-stopped frame must be IDENTICAL to running with iters =
    the stopping round (no approximation is introduced — only the
    round count becomes data-driven), and a zero-delta fixpoint
    stops well inside a generous budget."""
    from pipz_spark.datapipe import pagerank

    # a 2-cycle reaches an exact integer fixpoint quickly: ranks
    # alternate then stabilize when base + damped inflow maps the
    # rank to itself under integer truncation
    pairs = [("a", "b"), ("b", "a"), ("a", "c")]
    df = spark.createDataFrame(pairs, "src string, dst string")
    fixed = {
        r["node"]: (r["rank_q"], r["outdeg"])
        for r in pagerank(df, iters=60, init_q=10**6).collect()
    }
    got = {
        r["node"]: (r["rank_q"], r["outdeg"])
        for r in pagerank(df, iters=200, init_q=10**6, tol=0).collect()
    }
    # a tol=0 stop IS a fixpoint: more rounds cannot change it, so
    # it equals any sufficiently long fixed run
    assert got == fixed
    # looser tol stops earlier but must equal SOME fixed-iters run
    loose = {
        r["node"]: r["rank_q"]
        for r in pagerank(df, iters=200, init_q=10**6, tol=10**4).collect()
    }
    candidates = []
    for it in range(1, 25):
        candidates.append(
            {
                r["node"]: r["rank_q"]
                for r in pagerank(df, iters=it, init_q=10**6).collect()
            }
        )
    assert loose in candidates
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pagerank(df, iters=3, tol=-1)


def test_hits_overflow_guard_raises_before_wrapping(spark):
    """hits() ENFORCES its documented BIGINT bound at build time
    (r15 advice): a dense graph whose (max_indeg·max_outdeg)^iters
    crosses 2^62 raises a ValueError naming norm_every instead of
    silently wrapping; the same call with norm_every set runs."""
    import pytest as _pytest

    from pipz_spark.datapipe import hits
    from pipz_spark.datapipe import release_caches as _release

    dense = spark.createDataFrame(
        [(i, j) for i in range(40) for j in range(40)],
        "src long, dst long",
    )
    with _pytest.raises(ValueError, match="norm_every"):
        hits(dense, iters=9)
    # rescaling bounds the scores, so the same budget is legal
    rows = hits(dense, iters=9, norm_every=1).limit(1).collect()
    assert len(rows) == 1
    _release()


def test_pagerank_tol_budget_exhaustion_warns_and_empty_graph_fast(spark):
    """tol mode surfaces a non-converged exit (r15 advice): burning
    the iters budget before delta <= tol emits a RuntimeWarning; a
    converged run emits none; and an EMPTY graph exits on round 1
    (delta is NULL — the SUM-over-zero-rows fixpoint) instead of
    paying a checkpoint+collect per budgeted round."""
    import warnings as _warnings

    from pipz_spark.datapipe import pagerank

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "src long, dst long"
    )
    with _warnings.catch_warnings(record=True) as wl:
        _warnings.simplefilter("always")
        pagerank(chain, iters=1, tol=0).collect()
    assert any("exhausted" in str(w.message) for w in wl)
    with _warnings.catch_warnings(record=True) as wl:
        _warnings.simplefilter("always")
        pagerank(chain, iters=100, tol=0).collect()
    assert not any("exhausted" in str(w.message) for w in wl)
    empty = spark.createDataFrame([], "src long, dst long")
    with _warnings.catch_warnings(record=True) as wl:
        _warnings.simplefilter("always")
        assert pagerank(empty, iters=50, tol=1).count() == 0
    assert not any("exhausted" in str(w.message) for w in wl)


def test_personalized_pagerank_zero_floored_base_keeps_seed_mass(spark):
    """base = init_q·(den−num)//den floors to 0 for damping near 1
    with a small init_q (99/100 with init_q=50 → base=0); seeds must
    STILL start with init_q mass — the seed FLAG decides the rank
    init, not ``_base > 0`` (r14 ADVICE regression)."""
    from pipz_spark.datapipe import pagerank

    pairs = [("s1", "a"), ("a", "s1")]
    df = spark.createDataFrame(pairs, "src string, dst string")
    seeds = spark.createDataFrame([("s1",)], "node string")
    for iters in (1, 2):
        got = {
            r["node"]: (r["rank_q"], r["outdeg"])
            for r in pagerank(
                df, iters=iters, seeds=seeds, damping=(99, 100), init_q=50
            ).collect()
        }
        assert got == _ref_ppr(pairs, iters, {"s1"}, init_q=50, num=99, den=100)
    # the decisive check: the seed's initial mass actually flowed
    one = dict(
        (r["node"], r["rank_q"])
        for r in pagerank(
            df, iters=1, seeds=seeds, damping=(99, 100), init_q=50
        ).collect()
    )
    assert one["a"] > 0


def _ref_waterfill(supplies, budget):
    """Integer max-min fair allocation replay."""
    items = sorted(supplies.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(items)
    prefix = 0
    lev = rem = None
    for idx, (dom, s) in enumerate(items, 1):
        cand = (budget - prefix) // (n - idx + 1)
        if s > cand:
            lev, rem = cand, (budget - prefix) % (n - idx + 1)
            break
        prefix += s
    if lev is None:
        return dict(supplies)
    plus = set(sorted(d for d, s in supplies.items() if s > lev)[:rem])
    return {
        d: (s if s <= lev else lev + (1 if d in plus else 0))
        for d, s in supplies.items()
    }


def test_waterfill_allocation(spark):
    from pipz_spark.datapipe import waterfill_allocation

    rows = (
        [("web",)] * 40 + [("code",)] * 25 + [("books",)] * 10 + [("ref",)] * 3
    )
    df = spark.createDataFrame(rows, "lang string")
    for budget in (5, 20, 50, 77, 78, 100):
        got = {
            r["lang"]: (r["supply"], r["allocation"])
            for r in waterfill_allocation(df, budget).collect()
        }
        sup = {"web": 40, "code": 25, "books": 10, "ref": 3}
        want = _ref_waterfill(sup, budget)
        assert got == {d: (sup[d], want[d]) for d in sup}, budget
        # conservation + the max-min cap property
        assert sum(a for _, a in got.values()) == min(budget, 78)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        waterfill_allocation(df, 0)


def _ref_wpagerank(weighted_edges, iters, init_q=10**12, num=17, den=20):
    """Weighted-PageRank replay: proportional split by edge weight."""
    edges = [(s, d, w) for s, d, w in weighted_edges if w and w > 0]
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    ws: dict = {}
    for s, _, w in edges:
        ws[s] = ws.get(s, 0) + w
    base = (init_q * (den - num)) // den
    rank = {n: init_q for n in nodes}
    for _ in range(iters):
        ins: dict = {}
        for s, d, w in edges:
            ins[d] = ins.get(d, 0) + (rank[s] * w) // ws[s]
        rank = {n: base + (ins.get(n, 0) * num) // den for n in nodes}
    return {n: (rank[n], ws.get(n, 0)) for n in nodes}


def test_weighted_pagerank_matches_replay(spark):
    """weight_col= splits mass proportionally to edge weights
    (divide-first exact); weight 1 everywhere equals the unweighted
    machine; non-positive/NULL weights drop."""
    from pipz_spark.datapipe import pagerank

    wedges = [
        ("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 5),
        ("c", "d", 1), ("d", "a", 4), ("a", "d", 0), ("b", "d", None),
    ]
    df = spark.createDataFrame(wedges, "src string, dst string, w long")
    got = {
        r["node"]: (r["rank_q"], r["outdeg"])
        for r in pagerank(df, iters=3, weight_col="w").collect()
    }
    assert got == _ref_wpagerank(wedges, 3)
    # unit weights == the unweighted machine exactly
    ones = spark.createDataFrame(
        [(s, d, 1) for s, d, w in wedges if w], "src string, dst string, w long"
    )
    uni = {
        r["node"]: r["rank_q"]
        for r in pagerank(ones.select("src", "dst"), iters=2).collect()
    }
    wuni = {
        r["node"]: r["rank_q"]
        for r in pagerank(ones, iters=2, weight_col="w").collect()
    }
    assert uni == wuni


# ---- r16: LPA community detection + multi-source BFS --------------


def _ref_lpa(pairs, iters):
    """Pure-Python replay of deterministic frequency LPA: symmetric
    edges, synchronous rounds, self-vote, (count DESC, label ASC)."""
    sym = set()
    for s, d in pairs:
        if s is None or d is None:
            continue
        sym.add((s, d))
        sym.add((d, s))
    # multi-edges in the INPUT collapse only if duplicated after the
    # NULL drop — the engine keeps multiplicity, so replay from the
    # raw list, not the set
    adj = []
    for s, d in pairs:
        if s is None or d is None:
            continue
        adj.append((s, d))
        adj.append((d, s))
    nodes = {s for s, _ in adj} | {d for _, d in adj}
    labels = {n: n for n in nodes}
    for _ in range(iters):
        votes = {n: {} for n in nodes}
        for s, d in adj:
            lbl = labels[s]
            votes[d][lbl] = votes[d].get(lbl, 0) + 1
        for n in nodes:
            own = labels[n]
            votes[n][own] = votes[n].get(own, 0) + 1
        labels = {
            n: min(v.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            for n, v in votes.items()
        }
    return labels


def test_label_propagation_matches_replay(spark):
    from pipz_spark.datapipe import label_propagation

    # two triangles joined by one cut edge: LPA must keep two
    # communities where min-label floods one component
    pairs = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("x", "y"), ("y", "z"), ("z", "x"),
        ("c", "x"),
    ]
    df = spark.createDataFrame(pairs, "src string, dst string")
    for iters in (0, 1, 2, 3):
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, iters=iters).collect()
        }
        assert got == _ref_lpa(pairs, iters)
    # converged communities: the triangles keep distinct labels
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, iters=3, checkpoint_every=2).collect()
    }
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["x"] == got["y"] == got["z"] == "x"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        label_propagation(df, iters=-1)
    with _pytest.raises(ValueError):
        label_propagation(df, checkpoint_every=0)


def test_label_propagation_bipartite_no_oscillation(spark):
    """The self-vote damps the synchronous two-coloring oscillation:
    on K2,2 labels converge instead of swapping forever."""
    from pipz_spark.datapipe import label_propagation

    pairs = [("a", "p"), ("a", "q"), ("b", "p"), ("b", "q")]
    df = spark.createDataFrame(pairs, "src string, dst string")
    l3 = {
        r["node"]: r["label"]
        for r in label_propagation(df, iters=3).collect()
    }
    l4 = {
        r["node"]: r["label"]
        for r in label_propagation(df, iters=4).collect()
    }
    assert l3 == l4 == _ref_lpa(pairs, 3)


def _ref_bfs(pairs, seeds, iters, symmetric):
    adj = []
    for s, d in pairs:
        if s is None or d is None:
            continue
        adj.append((s, d))
        if symmetric:
            adj.append((d, s))
    dist = {s: 0 for s in seeds if s is not None}
    for _ in range(iters):
        new = dict(dist)
        for s, d in adj:
            if s in dist:
                cand = dist[s] + 1
                if d not in new or cand < new[d]:
                    new[d] = cand
        dist = new
    return dist


def test_bfs_hops_matches_replay(spark):
    from pipz_spark.datapipe import bfs_hops

    pairs = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
        ("q", "a"), ("e", "q"), ("u", "v"),
    ]
    df = spark.createDataFrame(pairs, "src string, dst string")
    seeds = spark.createDataFrame([("a",), ("lonely",)], "node string")
    for iters in (0, 1, 2, 3):
        for symmetric in (False, True):
            got = {
                r["node"]: r["hops"]
                for r in bfs_hops(
                    df, seeds, iters=iters, symmetric=symmetric
                ).collect()
            }
            assert got == _ref_bfs(pairs, ["a", "lonely"], iters, symmetric)
    # unreached nodes absent; seeds with no edges present at 0
    got = {
        r["node"]: r["hops"]
        for r in bfs_hops(df, seeds, iters=2, checkpoint_every=1).collect()
    }
    assert "u" not in got and "v" not in got and got["lonely"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bfs_hops(df, seeds, iters=-1)
    with _pytest.raises(ValueError):
        bfs_hops(df, seeds, checkpoint_every=0)


def test_bfs_hops_duplicate_and_null_seeds(spark):
    """Duplicate seed rows collapse; NULL seeds drop; directed hops
    follow edge direction only."""
    from pipz_spark.datapipe import bfs_hops

    df = spark.createDataFrame(
        [("a", "b"), ("c", "b")], "src string, dst string"
    )
    seeds = spark.createDataFrame(
        [("a",), ("a",), (None,)], "node string"
    )
    got = {
        r["node"]: r["hops"] for r in bfs_hops(df, seeds, iters=2).collect()
    }
    assert got == {"a": 0, "b": 1}


# ---- r16: reciprocal rank fusion ----------------------------------


def _ref_rrf(lists, k=10, rrf_k=60):
    """Pure-Python RRF replay: fixed list order fold, (rrf DESC, id)."""
    acc = {}
    for li in lists:
        for q, d, r in li:
            key = (q, d)
            s, n = acc.get(key, (0.0, 0))
            acc[key] = (s + 1.0 / (rrf_k + r), n + 1)
    out = {}
    byq = {}
    for (q, d), (s, n) in acc.items():
        byq.setdefault(q, []).append((d, s, n))
    for q, rows in byq.items():
        rows.sort(key=lambda t: (-t[1], t[0]))
        for rank, (d, s, n) in enumerate(rows[:k], start=1):
            out[(q, d)] = (s, n, rank)
    return out


def test_rrf_fuse_matches_replay_three_lists(spark):
    """Three-list fusion: overlap counts, rank-1/(60+r) sums, ties on
    id — against the pure replay (N > 2 exercises the sorted fold)."""
    from pipz_spark.datapipe import rrf_fuse

    l1 = [(0, "a", 1), (0, "b", 2), (1, "x", 1)]
    l2 = [(0, "b", 1), (0, "c", 2), (1, "x", 2)]
    l3 = [(0, "a", 2), (0, "c", 1), (1, "y", 1)]
    dfs = [
        spark.createDataFrame(li, "query_id int, doc_id string, rank int")
        for li in (l1, l2, l3)
    ]
    got = {
        (r["query_id"], r["doc_id"]): (r["rrf"], r["n_lists"], r["rank"])
        for r in rrf_fuse(dfs, k=10).collect()
    }
    assert got == _ref_rrf([l1, l2, l3])
    # found-by-all doc carries n_lists = 3
    assert got[(0, "a")][1] == 2 and got[(0, "b")][1] == 2


def test_rrf_fuse_k_cutoff_and_validation(spark):
    from pipz_spark.datapipe import rrf_fuse
    import pytest as _pytest

    li = [(0, f"d{i}", i) for i in range(1, 6)]
    df = spark.createDataFrame(li, "query_id int, doc_id string, rank int")
    out = rrf_fuse([df], k=3).collect()
    assert len(out) == 3 and {r["rank"] for r in out} == {1, 2, 3}
    # single-list fusion preserves the input order
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [
        "d1", "d2", "d3",
    ]
    with _pytest.raises(ValueError):
        rrf_fuse([df], k=0)
    with _pytest.raises(ValueError):
        rrf_fuse([df], rrf_k=0)
    with _pytest.raises(ValueError):
        rrf_fuse([])


# ---- r16: greedy k-center diversity selection ---------------------


def _ref_kcenter(rows, k, salt="kcenter", q=1_000_000_000):
    """Pure-Python replay of Gonzalez farthest-point: hash-minimal
    seed, argmax-of-min integer distance, (d, cid) assignment."""
    import hashlib
    import math as _m

    pts = [(i, v) for i, v in rows if v is not None]

    def dq(a, b):
        return sum(
            int(_m.floor((x - y) * (x - y) * float(q) + 0.5))
            for x, y in zip(a, b)
        )

    seed = min(
        pts,
        key=lambda p: (hashlib.md5((str(p[0]) + salt).encode()).hexdigest(), p[0]),
    )
    centers = [seed]
    while len(centers) < k:
        far = sorted(
            pts,
            key=lambda p: (-min(dq(p[1], c[1]) for c in centers), p[0]),
        )[0]
        centers.append(far)
    out = {}
    for i, v in pts:
        best = min((dq(v, cv), cid) for cid, cv in centers)
        out[i] = (best[1], best[0])
    return out


def test_kcenter_select_matches_replay(spark):
    from pipz_spark.datapipe import kcenter_select

    rows = [
        (0, [0.0, 0.0]), (1, [0.1, 0.0]), (2, [10.0, 0.0]),
        (3, [10.1, 0.1]), (4, [0.0, 10.0]), (5, [5.0, 5.0]),
        (6, None),
    ]
    df = spark.createDataFrame(
        rows, "vec_id int, embedding array<double>"
    )
    for k in (1, 2, 3, 4):
        got = {
            r["vec_id"]: (r["center_id"], r["d2_q"])
            for r in kcenter_select(df, k=k).collect()
        }
        assert got == _ref_kcenter(rows, k)
    # every selected center assigns to itself at distance 0
    got = kcenter_select(df, k=3).collect()
    cids = {r["center_id"] for r in got}
    for r in got:
        if r["vec_id"] in cids:
            assert r["center_id"] == r["vec_id"] and r["d2_q"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        kcenter_select(df, k=0)


def test_kcenter_select_covers_farthest_first(spark):
    """The greedy invariant: after selecting k centers the covering
    radius (max assignment distance) never exceeds the distance of
    the NEXT point the greedy would pick — i.e. radius is the k-th
    farthest-point gap, monotonically non-increasing in k."""
    from pipz_spark.datapipe import kcenter_select

    import random as _r

    rng = _r.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    radii = []
    for k in (1, 2, 4, 8):
        out = kcenter_select(df, k=k).collect()
        radii.append(max(r["d2_q"] for r in out))
    assert radii == sorted(radii, reverse=True)


def _ref_sssp(wedges, seeds, iters, symmetric):
    adj = []
    for s, d, w in wedges:
        if s is None or d is None or w is None or w <= 0:
            continue
        adj.append((s, d, w))
        if symmetric:
            adj.append((d, s, w))
    dist = {s: 0 for s in seeds if s is not None}
    for _ in range(iters):
        new = dict(dist)
        for s, d, w in adj:
            if s in dist:
                cand = dist[s] + w
                if d not in new or cand < new[d]:
                    new[d] = cand
        dist = new
    return dist


def test_sssp_cost_matches_replay(spark):
    """Bounded Bellman-Ford equals the pure replay; weight 1
    everywhere equals bfs_hops exactly; NULL/non-positive weights
    drop their edge."""
    from pipz_spark.datapipe import bfs_hops, sssp_cost

    wedges = [
        ("a", "b", 5), ("a", "c", 1), ("c", "b", 1), ("b", "d", 2),
        ("c", "d", 10), ("d", "e", 1), ("x", "a", None), ("e", "a", 0),
    ]
    df = spark.createDataFrame(wedges, "src string, dst string, w long")
    seeds = spark.createDataFrame([("a",)], "node string")
    for iters in (0, 1, 2, 3):
        for symmetric in (False, True):
            got = {
                r["node"]: r["cost"]
                for r in sssp_cost(
                    df, seeds, iters=iters, symmetric=symmetric
                ).collect()
            }
            assert got == _ref_sssp(wedges, ["a"], iters, symmetric)
    # the 2-hop a->c->b (cost 2) must undercut the direct a->b (5);
    # e's cheapest route a->c->b->d->e (cost 5) needs 4 hops, so the
    # 3-round budget reports the 3-hop a->b->d->e (cost 8) — the
    # bounded-Bellman-Ford invariant, visible
    got = {r["node"]: r["cost"] for r in sssp_cost(df, seeds, iters=3).collect()}
    assert got["b"] == 2 and got["d"] == 4 and got["e"] == 8
    got4 = {r["node"]: r["cost"] for r in sssp_cost(df, seeds, iters=4).collect()}
    assert got4["e"] == 5
    # unit weights degenerate to bfs_hops
    ones = spark.createDataFrame(
        [(s, d, 1) for s, d, _ in wedges], "src string, dst string, w long"
    )
    cost = {
        r["node"]: r["cost"] for r in sssp_cost(ones, seeds, iters=2).collect()
    }
    hops = {
        r["node"]: r["hops"]
        for r in bfs_hops(ones.select("src", "dst"), seeds, iters=2).collect()
    }
    assert cost == hops
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sssp_cost(df, seeds, iters=-1)


# ---- r16: MMR diversified re-ranking ------------------------------


def _ref_mmr(cands, k, lam=0.5):
    """Pure-Python MMR replay: cands = [(q, id, rel, vec)], rounded
    cosine sims, (score DESC, id ASC) greedy, first pick lam*rel."""
    import math as _m

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y
        na = 0.0
        for x in a:
            na += x * x
        nb = 0.0
        for y in b:
            nb += y * y
        c = dot / (_m.sqrt(na) * _m.sqrt(nb))
        # replay Spark/DuckDB round-half-up at 1e-6 (F.round semantics)
        return _m.floor(c * 1e6 + 0.5) / 1e6 if c >= 0 else -_m.floor(-c * 1e6 + 0.5) / 1e6

    out = {}
    byq = {}
    for q, i, rel, v in cands:
        byq.setdefault(q, []).append((i, rel, v))
    for q, rows in byq.items():
        sel = []
        maxsim = {}
        pool = {i: (rel, v) for i, rel, v in rows}
        first = sorted(pool.items(), key=lambda kv: (-lam * kv[1][0], kv[0]))[0]
        sel.append((first[0], lam * first[1][0]))
        del pool[first[0]]
        for i in pool:
            maxsim[i] = cos(pool[i][1], first[1][1])
        while len(sel) < k and pool:
            best = sorted(
                pool.items(),
                key=lambda kv: (-(lam * kv[1][0] - (1 - lam) * maxsim[kv[0]]), kv[0]),
            )[0]
            bid = best[0]
            sel.append((bid, lam * best[1][0] - (1 - lam) * maxsim[bid]))
            bvec = pool[bid][1]
            del pool[bid]
            for i in pool:
                s = cos(pool[i][1], bvec)
                if s > maxsim[i]:
                    maxsim[i] = s
        for rank, (i, sc) in enumerate(sel, start=1):
            out[(q, i)] = (rank, round(sc, 12))
    return out


def test_mmr_rerank_matches_replay(spark):
    from pipz_spark.datapipe import mmr_rerank

    # query 0: a is most relevant; b is a near-clone of a, so MMR
    # must skip it for the orthogonal c at round 2
    cands = [
        (0, "a", 0.95, [1.0, 0.0, 0.0]),
        (0, "b", 0.94, [0.999, 0.01, 0.0]),
        (0, "c", 0.50, [0.0, 1.0, 0.0]),
        (0, "d", 0.40, [0.0, 0.9, 0.4]),
        (1, "x", 0.80, [0.5, 0.5, 0.0]),
        (1, "y", 0.70, [0.5, 0.49, 0.01]),
    ]
    df = spark.createDataFrame(
        cands, "query_id int, doc_id string, rel double, embedding array<double>"
    )
    for k in (1, 2, 3):
        got = {
            (r["query_id"], r["doc_id"]): (r["mmr_rank"], round(r["mmr"], 12))
            for r in mmr_rerank(df, k=k).collect()
        }
        assert got == _ref_mmr(cands, k)
    got = {
        (r["query_id"], r["doc_id"]): r["mmr_rank"]
        for r in mmr_rerank(df, k=3).collect()
    }
    # the near-clone b is deferred behind the diverse c
    assert got[(0, "a")] == 1 and got[(0, "c")] == 2 and got[(0, "b")] == 3
    # a 2-candidate query exhausts its pool without error
    assert got[(1, "x")] == 1 and got[(1, "y")] == 2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mmr_rerank(df, k=0)
    with _pytest.raises(ValueError):
        mmr_rerank(df, lam=1.5)


def test_mmr_rerank_drops_degenerate_candidates(spark):
    """NULL rel, NULL vector, and zero-norm vector rows are dropped
    up front — a NULL score would win the nulls-first struct-MIN
    argmax, and a zero-norm cosine raises under ANSI."""
    from pipz_spark.datapipe import mmr_rerank

    rows = [
        (0, "a", 0.9, [1.0, 0.0]),
        (0, "b", 0.8, [0.9, 0.1]),
        (0, "z", None, [1.0, 1.0]),
        (0, "w", 0.7, None),
        (0, "n", 0.6, [0.0, 0.0]),
        (1, "x", 0.5, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "query_id int, doc_id string, rel double, embedding array<double>"
    )
    out = mmr_rerank(df, k=3).collect()
    ids0 = {r["doc_id"] for r in out if r["query_id"] == 0}
    assert ids0 == {"a", "b"}
    assert all(r["mmr"] is not None for r in out)
    # k=1 takes the pool-free path (no cosine pass at all)
    assert len(mmr_rerank(df, k=1).collect()) == 2


def _ref_common_neighbors(pairs, min_common, max_degree):
    """Pure-Python replay: canonical simple graph, capped wedge
    centers, non-adjacent pairs with >= min_common shared
    neighbors + degree product."""
    und = set()
    for s, d in pairs:
        if s is None or d is None or s == d:
            continue
        und.add((min(s, d), max(s, d)))
    nbrs: dict = {}
    for u, v in und:
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    deg = {n: len(s) for n, s in nbrs.items()}
    from collections import Counter

    cnt: Counter = Counter()
    for w, ns in nbrs.items():
        if max_degree is not None and deg[w] > max_degree:
            continue
        ns_sorted = sorted(ns)
        for i, a in enumerate(ns_sorted):
            for b in ns_sorted[i + 1:]:
                cnt[(a, b)] += 1
    return {
        (a, b): (c, deg[a] * deg[b])
        for (a, b), c in cnt.items()
        if c >= min_common and (a, b) not in und
    }


def test_common_neighbor_pairs_matches_replay(spark):
    from pipz_spark.datapipe import common_neighbor_pairs

    # hub h connects everyone; capping it must drop its wedges
    pairs = [
        ("a", "w1"), ("b", "w1"), ("a", "w2"), ("b", "w2"),
        ("a", "w3"), ("c", "w3"), ("b", "c"),
        ("h", "a"), ("h", "b"), ("h", "c"), ("h", "w1"), ("h", "w2"),
        ("x", "x"), (None, "a"),
    ]
    df = spark.createDataFrame(pairs, "src string, dst string")
    for min_common, max_degree in ((1, None), (2, None), (1, 3), (2, 3)):
        got = {
            (r["id_a"], r["id_b"]): (r["common"], r["pref_attach"])
            for r in common_neighbor_pairs(
                df, min_common=min_common, max_degree=max_degree
            ).collect()
        }
        assert got == _ref_common_neighbors(pairs, min_common, max_degree)
    # the signature prediction: a and b share w1+w2 (and h) but are
    # NOT adjacent -> top predicted link; b-c IS an edge -> absent
    got = {
        (r["id_a"], r["id_b"]): r["common"]
        for r in common_neighbor_pairs(df, min_common=2).collect()
    }
    assert got[("a", "b")] >= 2 and ("b", "c") not in got
    import pytest as _pytest

    with _pytest.raises(ValueError):
        common_neighbor_pairs(df, min_common=0)
    with _pytest.raises(ValueError):
        common_neighbor_pairs(df, max_degree=0)
