"""Physical-plan invariants for the contract queries — the plans we
audited with .explain(), frozen as regressions: column pruning reaches
the scan, filters push down to parquet, small dims broadcast, LSH joins
are equi-joins (no cartesian product), aggregates partial-aggregate
map-side, and expressions stay inside whole-stage codegen."""

from __future__ import annotations

import os

import pytest

from pipelinewise_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _plan(spark, name: str, execute: bool = False) -> str:
    df = QUERIES[name](spark, SF_DIR)
    if execute:
        # force AQE to finalize: a query whose plan now contains an
        # exchange (r8: opt-in scan spreading) shows only
        # "AdaptiveSparkPlan isFinalPlan=false" before execution, with
        # the codegen stage markers hidden until stages materialize.
        # Must be an action on THIS DataFrame's queryExecution (a
        # write/noop would plan a fresh one) — sf0.001 rows are tiny.
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_t1_projection_prunes_scan(spark):
    plan = _plan(spark, "t1_projection_selected_columns")
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    # only the 3 selected columns reach the parquet reader
    assert "o_orderkey" in scan and "o_orderdate" in scan and "o_totalprice" in scan
    assert "o_custkey" not in scan and "o_comment" not in scan


def test_s11_bookmark_filter_pushed_down(spark):
    plan = _plan(spark, "s11_incremental_scan")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "GreaterThan(event_id" in pushed[0]


def test_j6_small_dim_broadcasts(spark):
    plan = _plan(spark, "j6_partial_sync_range")
    assert "BroadcastHashJoin" in plan
    # and the date-range predicate reaches the orders scan
    assert "PushedFilters" in plan and "GreaterThanOrEqual(o_orderdate" in plan


def test_lsh_joins_are_equijoins_not_cartesian(spark):
    for name in ("dedup_minhash_lsh", "ann_lsh_similar_pairs",
                 "ann_lsh_banded_pairs", "ann_lsh_topk"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or \
            "ShuffledHashJoin" in plan, name


def test_a3_aggregates_partially_map_side(spark):
    plan = _plan(spark, "a3_batch_metrics")
    # partial + final HashAggregate pair around one exchange: replay
    # duplicates / hot groups collapse before the shuffle
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning" in plan


def test_hot_path_stays_in_codegen(spark):
    """Transform/canonicalization queries run as built-in expressions
    inside WholeStageCodegen — no Python evaluation nodes."""
    for name in ("t2_canonicalize_ts", "t4_t6_masks_customer",
                 "t7_conditional_mask", "text_lang_id", "s8_lsn_arithmetic"):
        plan = _plan(spark, name, execute=True)
        # "*(n)" is toString's whole-stage-codegen stage marker
        assert "WholeStageCodegen" in plan or "*(" in plan, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_python_only_where_sanctioned(spark):
    """mapInPandas appears ONLY in the multimodal queries (the declared
    Arrow-batched Python path); every other contract query is JVM-only."""
    for name, fn in QUERIES.items():
        plan = _plan(spark, name)
        has_python = ("MapInPandas" in plan or "BatchEvalPython" in plan
                      or "ArrowEvalPython" in plan)
        if name.startswith("multimodal"):
            assert "MapInPandas" in plan, name
        else:
            assert not has_python, f"{name} runs Python in the hot path"


@pytest.mark.parametrize("name", ["ann_cosine_topk", "ann_ivf_topk", "a5_max_pk_probe"])
def test_cross_joins_are_broadcast_only(spark, name):
    """The only sanctioned cross joins carry a broadcast scalar/centroid
    side — never a shuffled cartesian of two large inputs."""
    plan = _plan(spark, name)
    if "CartesianProduct" in plan:
        raise AssertionError(f"{name} plans a CartesianProduct")
    # any cross join must be the broadcast nested-loop form (small side
    # broadcast), never a shuffled one — plan strings print the join type
    # after the key lists, e.g. "SortMergeJoin [k], [k], Cross"
    for ln in plan.splitlines():
        if ", Cross" in ln or " Cross," in ln:
            assert "BroadcastNestedLoopJoin" in ln, f"{name}: shuffled cross join: {ln}"
