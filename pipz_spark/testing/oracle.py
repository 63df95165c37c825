"""Oracle/Spark output *type* parity.

Round-8 lesson (CORRECTNESS_r08: ``dp_ngram_repetition`` and
``dp_pack_sequences`` driver-red): DuckDB widens integer ``SUM`` (and
``//`` / ``%`` over a widened operand) to HUGEINT (int128), while the
Spark side emits BIGINT. Both local gates compared **Python values**,
which erase the width difference, so the bug sailed through locally
and only the driver's type-sensitive value-hash caught it.

This module closes that masking hole: an explicit DuckDB-type →
acceptable-Spark-type mapping, applied by BOTH local gates
(``tools/check_correctness.py`` and ``tests/test_tail_oracle.py``) to
every executed oracle. Any oracle output column whose DuckDB type has
no acceptable Spark counterpart (HUGEINT/UHUGEINT always; DECIMAL
against a non-decimal Spark column; any mapped-type mismatch) fails
the gate even when every value compares equal.

See DIVERGENCES.md ("DuckDB integer-SUM widening") for the rule:
always CAST aggregate integer outputs in oracle SQL.
"""

from __future__ import annotations

import re

# DuckDB type name (parameters stripped, upper-cased) → Spark
# ``DataType.simpleString()`` values the driver's hash treats as the
# same physical encoding. An EMPTY set means the DuckDB type must
# never appear in an oracle output column (no Spark query in this
# repo can produce it, so its presence is always a widening bug).
# Types absent from the table (LIST/STRUCT/MAP/...) are skipped —
# nested outputs get value-compared only, as before.
_DUCK_TO_SPARK: dict[str, set[str]] = {
    "TINYINT": {"tinyint"},
    "SMALLINT": {"smallint"},
    "INTEGER": {"int"},
    "BIGINT": {"bigint"},
    # unsigned / widened integers: no Spark counterpart → always red
    "UTINYINT": set(),
    "USMALLINT": set(),
    "UINTEGER": set(),
    "UBIGINT": set(),
    "HUGEINT": set(),
    "UHUGEINT": set(),
    "FLOAT": {"float"},
    "DOUBLE": {"double"},
    "VARCHAR": {"string"},
    "BOOLEAN": {"boolean"},
    "DATE": {"date"},
    "TIME": set(),
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "TIMESTAMP WITH TIME ZONE": {"timestamp"},
    "BLOB": {"binary"},
    # DECIMAL handled specially below (precision/scale must agree)
}

_PARAM_RE = re.compile(r"\s*\(.*\)\s*$")


def _base(duck_type: str) -> str:
    return _PARAM_RE.sub("", str(duck_type).strip()).upper()


def type_parity_issues(
    oracle_cols: list[str],
    oracle_types: list,
    spark_types: dict[str, str],
) -> list[str]:
    """Return one message per oracle output column whose DuckDB type
    cannot hash-match the Spark column's type.

    ``oracle_cols`` / ``oracle_types`` come from a DuckDB relation's
    ``.columns`` / ``.types``; ``spark_types`` maps column name →
    ``DataType.simpleString()``. Column-name mismatches are NOT
    reported here — the schema gate owns those.
    """
    issues: list[str] = []
    for col, dt in zip(oracle_cols, oracle_types):
        st = spark_types.get(col)
        if st is None:
            continue  # schema gate reports missing columns
        duck = _base(dt)
        if duck == "DECIMAL":
            # family match is not enough: decimal(28,6) vs Spark's
            # SUM-widened decimal(38,6) are hash-incompatible physical
            # types by the same width logic as the integer rows —
            # compare the (precision, scale) parameters exactly
            if st != str(dt).strip().lower().replace(" ", ""):
                issues.append(
                    f"col {col}: oracle {dt} vs spark {st} — decimal "
                    f"precision/scale must agree exactly; CAST the oracle "
                    f"output (DuckDB decimal division/aggregate widening; "
                    f"see DIVERGENCES.md)"
                )
            continue
        allowed = _DUCK_TO_SPARK.get(duck)
        if allowed is None:
            continue  # unmapped (nested etc.): value compare only
        if not allowed:
            issues.append(
                f"col {col}: oracle type {dt} has no Spark counterpart "
                f"— the driver's value-hash WILL mismatch even on equal "
                f"values; CAST the oracle output (DuckDB integer-SUM "
                f"widening; see DIVERGENCES.md)"
            )
        elif st not in allowed:
            issues.append(
                f"col {col}: oracle {dt} vs spark {st} — hash-incompatible "
                f"physical types; align the oracle CAST or the Spark cast"
            )
    return issues


def relation_type_issues(rel, spark_schema) -> list[str]:
    """Convenience wrapper: DuckDB relation + Spark ``StructType``."""
    spark_types = {f.name: f.dataType.simpleString() for f in spark_schema.fields}
    return type_parity_issues(list(rel.columns), list(rel.types), spark_types)
