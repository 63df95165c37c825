"""Sketches as the merge currency (r13 verdict ask #8): persist one
tiny sketch per day, answer month-wide questions by MERGING sketches
— the raw events are never rescanned.

The mergeable sketches this repo gates (HLL = cardinality, CMS =
frequency, Bloom = membership, KLL = distribution, MG = heavy-hitter
ENUMERATION, KMV = SET ALGEBRA) share the property that the sketch
of a UNION is a cheap fold of per-part sketches (register max /
counter sum / add-then-prune / bottom-k). That
is the whole 100 TB play: a daily job sketches only that day's
partition (bounded output: ≤ 2^b register rows, ≤ depth × width
counters), appends it to a sketch store measured in kilobytes, and
any later question — "distinct users this month", "event-type
traffic this month" — is answered from the store alone.

  1. split the events table into per-day batches (the stand-in for
     daily partitions landing over a month),
  2. per day: ``hll_sketch`` over user_id + ``cms_sketch`` over
     event_type + ``kll_sketch`` over the event value +
     ``mg_summary`` over user activity, appended to a parquet sketch
     store partitioned by day,
  3. month-end: read the store back, ``hll_merge`` + ``cms_merge`` +
     ``kll_merge`` + ``mg_merge`` across days, ``hll_estimate`` /
     ``cms_lookup`` / ``kll_quantile`` / ``mg_topk`` for the answers
     — percentiles AND "which users dominate" INCLUDED. The
     heavy-hitters question was the one the store could not answer
     until r16: ``cms_lookup`` needs a caller-supplied candidate set
     and exact top-k needs a rescan; MG closes that gap (≤ k+1 rows
     per day, true count ∈ [est, est + err] per reported key),
  4. audit: the merged registers and counters are BIT-IDENTICAL to
     sketching the whole period directly (max/sum commute with
     union) — asserted, not assumed.

    PYTHONPATH=/root/repo python examples/incremental_sketches.py [sf_dir]

pytest runs ``main`` at sf0.001
(tests/test_datapipe.py::test_incremental_sketches_example).
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

from pipz_spark import get_session
from pipz_spark.datapipe import (
    cms_lookup,
    cms_merge,
    cms_sketch,
    hll_estimate,
    hll_merge,
    hll_sketch,
    kll_merge,
    kll_quantile,
    kll_sketch,
)
from pipz_spark.datapipe.sketches import (
    kmv_merge,
    kmv_set_estimates,
    kmv_sketch,
    mg_merge,
    mg_summary,
    mg_topk,
)
from pipz_spark.sources.catalog import load_table


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None, store_dir: str | None = None) -> dict:
    own_session = spark is None
    if own_session:
        spark = get_session("incremental-sketches-demo")
    if store_dir is None:
        store_dir = tempfile.mkdtemp(prefix="sketch_store_")

    events = load_table(spark, "events", sf_dir).withColumn(
        "day", F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    )
    days = sorted(r["day"] for r in events.select("day").distinct().collect())
    print(f"{len(days)} days of events; sketch store at {store_dir}")

    # 2. the daily job: sketch ONLY that day's slice, append to the
    # store (each write is ≤ 2^12 + 3×1024 rows, kilobytes)
    for day in days:
        batch = events.where(F.col("day") == day)
        hll_sketch(batch, "user_id").withColumn("day", F.lit(day)).write.mode(
            "append"
        ).parquet(f"{store_dir}/hll")
        cms_sketch(batch, "event_type", width=1024, depth=3).withColumn(
            "day", F.lit(day)
        ).write.mode("append").parquet(f"{store_dir}/cms")
        kll_sketch(batch, "value", k=64, id_col="event_id").withColumn(
            "day", F.lit(day)
        ).write.mode("append").parquet(f"{store_dir}/kll")
        mg_summary(batch, "user_id", k=16).withColumn(
            "day", F.lit(day)
        ).write.mode("append").parquet(f"{store_dir}/mg")
        kmv_sketch(batch, "user_id", k=256).withColumn(
            "day", F.lit(day)
        ).write.mode("append").parquet(f"{store_dir}/kmv")

    # 3. month-end: answers come from the store, not the events
    hll_store = spark.read.parquet(f"{store_dir}/hll")
    cms_store = spark.read.parquet(f"{store_dir}/cms")
    merged_regs = hll_merge(hll_store.select("hll_bucket", "hll_rho"))
    month_users = hll_estimate(merged_regs).collect()[0]["hll_distinct"]
    print(f"distinct users this month (merged HLL): {month_users:.0f}")

    merged_ctr = cms_merge(cms_store.select("cms_row", "cms_pos", "cms_count"))
    etypes = events.select("event_type").distinct()
    traffic = {
        r["event_type"]: r["cms_est"]
        for r in cms_lookup(merged_ctr, etypes, "event_type", width=1024, depth=3).collect()
    }
    print(f"event-type traffic this month (merged CMS): {traffic}")
    kll_store = spark.read.parquet(f"{store_dir}/kll")
    month_kll = kll_merge(kll_store.select("kll_value", "kll_weight"), k=64)
    quantiles = {
        r["q"]: r["kll_quantile"]
        for r in kll_quantile(month_kll, [(1, 2), (9, 10), (99, 100)]).collect()
    }
    print(f"event-value percentiles this month (merged KLL): {quantiles}")
    # KMV: "how many users in the SECOND half of the month were NEW
    # vs the first half" — the set-DIFFERENCE question only the
    # bottom-k sample answers from the store (HLL would need
    # inclusion-exclusion and still couldn't give A−B directly)
    kmv_store = spark.read.parquet(f"{store_dir}/kmv")
    half = days[len(days) // 2]
    sk_old = kmv_merge(
        kmv_store.where(F.col("day") < half).select("kmv_hash"), k=256
    )
    sk_new = kmv_merge(
        kmv_store.where(F.col("day") >= half).select("kmv_hash"), k=256
    )
    sets = kmv_set_estimates(sk_old, sk_new, k=256).collect()[0]
    print(
        f"users new in 2nd half vs 1st (merged KMV): "
        f"{sets['kmv_b_only']:.1f} (union {sets['kmv_union']:.1f})"
    )
    mg_store = spark.read.parquet(f"{store_dir}/mg")
    month_mg = mg_merge(
        mg_store.select("day", "mg_key", "mg_est", "mg_err"),
        k=8,
        source_cols=["day"],
    )
    hot = [
        (r["mg_key"], r["mg_est"], r["mg_err"])
        for r in mg_topk(month_mg, 5).collect()
    ]
    print(f"top users this month (merged MG, true in [est, est+err]): {hot}")

    # 4. merge == direct: registers and counters bit-identical to
    # sketching the whole period in one pass
    direct_regs = {
        r["hll_bucket"]: r["hll_rho"] for r in hll_sketch(events, "user_id").collect()
    }
    merged = {r["hll_bucket"]: r["hll_rho"] for r in merged_regs.collect()}
    assert merged == direct_regs, "HLL merge must equal the direct sketch"
    direct_ctr = {
        (r["cms_row"], r["cms_pos"]): r["cms_count"]
        for r in cms_sketch(events, "event_type", width=1024, depth=3).collect()
    }
    merged_c = {
        (r["cms_row"], r["cms_pos"]): r["cms_count"] for r in merged_ctr.collect()
    }
    assert merged_c == direct_ctr, "CMS merge must equal the direct sketch"
    # KLL's merge is a lossy re-compaction (unlike max/sum), so the
    # audit is the BOUND, not bit-equality: every merged answer must
    # sit within per-day build error + one merge stride of the true
    # rank (computed here from the raw events, the oracle we are
    # about to stop needing)
    import bisect

    sv = sorted(r["value"] for r in events.select("value").collect())
    n = len(sv)
    kll_n = kll_quantile(month_kll, [(1, 2)]).collect()[0]["kll_n"]
    assert kll_n == n, "merged KLL total weight must equal the event count"
    # the MRL composition is ADDITIVE over the day builds: the sound
    # bound is Σ_days ceil(n_day/k) + one merge stride
    day_s_sum = sum((c + 63) // 64 for c in
                    [events.where(F.col("day") == d).count() for d in days])
    merge_s = (n + 63) // 64
    for phi, v in quantiles.items():
        lo = bisect.bisect_left(sv, v) + 1
        hi = bisect.bisect_right(sv, v)
        err = min(abs(lo - phi * n), abs(hi - phi * n))
        assert err <= day_s_sum + merge_s, (phi, v, err)
    # KMV audit: both halves' user sets are SMALL here (< k), so the
    # sample is complete and every set answer must be EXACT
    old_users = {
        r["user_id"]
        for r in events.where(F.col("day") < half).select("user_id").distinct().collect()
    }
    new_users = {
        r["user_id"]
        for r in events.where(F.col("day") >= half).select("user_id").distinct().collect()
    }
    if len(old_users | new_users) < 256:
        assert sets["kmv_b_only"] == float(len(new_users - old_users))
        assert sets["kmv_union"] == float(len(old_users | new_users))
    # MG audit: per reported key, est <= true <= est + err, and the
    # total offset respects the W/(k+1) merge bound
    true_user = {
        r["user_id"]: r["c"]
        for r in events.groupBy("user_id").agg(F.count("*").alias("c")).collect()
    }
    w_total = sum(true_user.values())
    for key, est, err in hot:
        assert est <= true_user[key] <= est + err, (key, est, err)
        assert err * 9 <= w_total, (err, w_total)
    print("audit: merged sketches bit-identical (HLL/CMS), KLL within "
          "bound, MG heavy hitters within [est, est+err]")

    if own_session:
        spark.stop()
    return {"days": len(days), "month_users": month_users, "traffic": traffic, "quantiles": quantiles, "heavy_hitters": hot, "new_users": sets["kmv_b_only"]}


if __name__ == "__main__":
    main(*sys.argv[1:2])
