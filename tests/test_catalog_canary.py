"""Environment-drift canary: pin the canonical dtypes of every test
table AND a known-value round-trip on events.ts.

The r4→r5 Spark upgrade silently changed what the parquet reader
yields for TIMESTAMP(NANOS) (long nanos → TIMESTAMP_NTZ), which
shipped as 1970-timestamp corruption in the streaming path with zero
crashes. This test converts the NEXT reader drift into a named
failure: if any table loads with an unexpected dtype, or events.ts
stops round-tripping to its known epoch range, this fails before any
query silently computes nonsense.

Reference analog: the compile-time typing of api.go:423-428 — the
reference cannot experience type drift; this canary is the runtime
assertion that stands in for that guarantee.
"""

from __future__ import annotations

import datetime

from pipz_spark.sources.catalog import load_table

from conftest import SF_DIR

# Canonical post-load_table schemas. `timestamp` for events.ts is the
# POST-NORMALIZATION contract (normalize_events_ts) regardless of what
# the reader yields; everything else is the reader's own mapping.
EXPECTED = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp_ntz"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp_ntz"),
    ],
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp"),
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}


def test_all_table_dtypes_are_canonical(spark):
    for name, expected in EXPECTED.items():
        df = load_table(spark, name, SF_DIR)
        got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
        assert got == expected, f"{name}: reader/normalizer drift: {got}"


def test_events_ts_epoch_is_session_timezone_independent(spark):
    """The correctness driver builds its own session, whose timezone
    the engine cannot assume. normalize_events_ts must yield the same
    epoch under any session zone (it uses calendar arithmetic, not a
    session-zone cast, on the NTZ reader path)."""
    from pyspark.sql import functions as F

    from pipz_spark.sources.catalog import normalize_events_ts

    def min_epoch():
        df = normalize_events_ts(
            spark.read.parquet(SF_DIR + "/events.parquet")
        )
        return df.select(F.min(F.unix_micros("ts"))).first()[0]

    prev = spark.conf.get("spark.sql.session.timeZone")
    utc_epoch = min_epoch()
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        assert min_epoch() == utc_epoch
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        assert min_epoch() == utc_epoch
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_normalize_events_ts_long_nanos_branch(spark):
    """Old Spark readers yield TIMESTAMP(NANOS) as long nanoseconds
    (under nanosAsLong); the current reader yields TIMESTAMP_NTZ, so
    this branch can only be exercised synthetically. Integer division
    must land on the exact microsecond (float /1000 on an ~1.7e18
    nanos epoch would drift ±1 µs: 53-bit mantissa)."""
    from pyspark.sql import functions as F

    from pipz_spark.sources.catalog import normalize_events_ts

    nanos = 1704067798778549999  # .778549999s — truncates to 778549 µs
    df = spark.createDataFrame([(nanos,)], "ts long")
    out = normalize_events_ts(df)
    assert out.schema["ts"].dataType.simpleString() == "timestamp"
    assert out.select(F.unix_micros("ts")).first()[0] == 1704067798778549


def test_normalize_events_ts_rejects_unknown_dtype(spark):
    import pytest

    from pipz_spark.sources.catalog import normalize_events_ts

    df = spark.createDataFrame([("not-a-time",)], "ts string")
    with pytest.raises(TypeError, match="unsupported reader dtype"):
        normalize_events_ts(df)


def test_events_ts_round_trips_to_known_epoch(spark):
    """The fixture generator writes 2024-epoch event times. A wrong
    nanos/micros normalization lands them in 1970 (divide twice) or
    year ~56k (divide never) — both far outside this window."""
    lo, hi = (
        load_table(spark, "events", SF_DIR)
        .selectExpr("min(ts) as lo", "max(ts) as hi")
        .first()
    )
    assert isinstance(lo, datetime.datetime)
    assert 2024 <= lo.year <= 2026, f"min(ts)={lo}: nanos/micros drift"
    assert 2024 <= hi.year <= 2026, f"max(ts)={hi}: nanos/micros drift"


def test_hash_bucket_pins_md5_conv_semantics(spark):
    """The sampling/split oracles replicate hash_bucket in SQL
    (md5 + first-8-hex-chars + base-16 parse + mod 10000). If either
    engine's md5/conv behavior drifts, every sampling query flips
    membership silently — pin one known value per path (string key,
    long key, NULL sentinel) against values DuckDB agrees on."""
    import duckdb

    from pyspark.sql import functions as F

    from pipz_spark.datapipe.sampling import hash_bucket

    got = (
        spark.range(1)
        .select(
            hash_bucket(F.lit("42"), "sample").alias("s"),
            hash_bucket(F.lit(42).cast("long"), "sample").alias("l"),
            hash_bucket(F.lit(None).cast("string"), "sample").alias("n"),
        )
        .first()
    )
    # long keys cast to string first, so "42" and 42 must agree
    assert got["s"] == got["l"]
    o = duckdb.sql(
        "SELECT CAST(('0x' || substring(md5('42' || 'sample'), 1, 8)) AS BIGINT) % 10000 AS s, "
        "CAST(('0x' || substring(md5('__pipz_null__' || 'sample'), 1, 8)) AS BIGINT) % 10000 AS n"
    ).fetchone()
    assert got["s"] == o[0], "md5/conv drift vs DuckDB on string keys"
    assert got["n"] == o[1], "NULL-sentinel bucketing drift vs DuckDB"
