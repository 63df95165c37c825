"""Plan-shape canaries for declared queries: the properties that make
these plans scale are asserted, not assumed, so an innocent-looking
refactor (or Catalyst behavior change) that silently degrades a plan
fails by name.

Each assertion encodes a fix or a design decision with a history:
duplicated JsonToStructs cost r5 a phantom 5s; a dimension join that
stops broadcasting becomes a sort-merge shuffle of the fact table at
100 TB; a similarity query that regresses to CartesianProduct is the
canonical non-scalable plan.
"""

from __future__ import annotations

import pytest

from pipz_spark.queries import QUERIES

from conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = QUERIES[name].build(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_json_parse_props_parses_once(spark):
    # the explode(array(..)) Generate barrier must keep projection
    # collapse from re-inlining from_json into the Either guard
    assert _plan(spark, "json_parse_props").count("from_json") == 1


def test_enrich_join_broadcasts_the_dimension(spark):
    plan = _plan(spark, "p5_enrich")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_global_sort_limit_compiles_to_take_ordered(spark):
    # sort+limit must fuse into TakeOrderedAndProject (per-partition
    # top-N + driver merge), never a global sort of the full table
    assert "TakeOrderedAndProject" in _plan(spark, "rel_sort_limit")


@pytest.mark.parametrize(
    "name",
    ["dp_cosine_topk", "dp_near_dup_minhash", "dp_embed_near_dup", "rel_asof_join"],
)
def test_no_cartesian_products(spark, name):
    assert "CartesianProduct" not in _plan(spark, name)
