"""Optimistic-concurrency conflict detection + property-based replay
equivalence (random op sequences vs the pure-Python fold oracle)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pipelinewise_spark.cdc.events import TRANSCRIPT_KEY, TRANSCRIPT_SCHEMA
from pipelinewise_spark.cdc.merge import merge_into
from pipelinewise_spark.cdc.oracle import fold_events
from pipelinewise_spark.lake.table import CommitConflict, LakeTable


def test_commit_conflict_detected(spark, tmp_path):
    """Two writers racing the same version: the loser raises
    CommitConflict and publishes nothing (atomic hard-link CAS)."""
    t1 = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY, num_buckets=2
    )
    t2 = LakeTable(spark, str(tmp_path / "t"))  # second writer handle
    t1.commit(summary={"operation": "writer1"})
    with pytest.raises(CommitConflict):
        t2.commit(summary={"operation": "writer2"})
    t2.refresh()
    assert t2.manifest["summary"]["operation"] == "writer1"
    # expected_version guard pre-checks without racing
    with pytest.raises(CommitConflict):
        t2.commit(summary={"operation": "writer2"}, expected_version=0)


# -------------------------- property-based replay equivalence -------------

event_st = st.fixed_dictionaries(
    {
        "conv_id": st.sampled_from(["c0", "c1", "c2"]),
        "turn_idx": st.integers(min_value=0, max_value=3),
        "op": st.sampled_from(["I", "U", "U", "D"]),
        "text": st.text(alphabet="abxyz ", min_size=0, max_size=12),
    }
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(event_st, min_size=1, max_size=25),
    soft=st.booleans(),
    split=st.integers(min_value=1, max_value=24),
)
def test_random_sequences_match_oracle(spark, tmp_path_factory, events, soft, split):
    rows = []
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    for i, e in enumerate(events):
        rows.append(
            {
                "lsn": i + 1,
                "op": e["op"],
                "stream": "s",
                "conv_id": e["conv_id"],
                "turn_idx": e["turn_idx"],
                "role": "user",
                "text": e["text"],
                "tool": None,
                "ts": base,
                "time_extracted": base,
            }
        )
    df = spark.createDataFrame(
        rows,
        "lsn long, op string, stream string, conv_id string, turn_idx int,"
        " role string, text string, tool string, ts timestamp,"
        " time_extracted timestamp",
    )
    path = tmp_path_factory.mktemp("prop")
    table = LakeTable.create(
        spark, str(path / "t"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY, num_buckets=2,
        properties={"soft_delete": soft},
    )
    cut = min(split, len(rows))
    merge_into(table, df.where(F.col("lsn") <= cut), batch_id=0,
               soft_delete=soft, stream="s")
    merge_into(table, df.where(F.col("lsn") > cut), batch_id=1,
               soft_delete=soft, stream="s")

    expected = fold_events(rows, TRANSCRIPT_KEY, soft_delete=soft)
    actual = {
        (r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()
    }
    assert set(actual) == set(expected)
    for k, exp in expected.items():
        if soft and exp["_deleted"]:
            assert actual[k]["_sdc_deleted_at"] is not None
        else:
            assert actual[k]["text"] == exp["text"], k
            assert actual[k]["_sdc_deleted_at"] is None
