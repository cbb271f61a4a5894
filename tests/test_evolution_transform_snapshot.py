"""F3 schema-evolution scenarios, the transform DSL, and the F4
snapshot+overlapping-tail consistency fixture."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructType

from pipelinewise_spark.cdc.events import TRANSCRIPT_KEY, TRANSCRIPT_SCHEMA
from pipelinewise_spark.cdc.gen import generate_change_events
from pipelinewise_spark.cdc.merge import merge_into
from pipelinewise_spark.cdc.snapshot import initial_load
from pipelinewise_spark.cdc.oracle import fold_events
from pipelinewise_spark.evolution.drift import diff_schemas, reconcile
from pipelinewise_spark.lake.table import LakeTable
from pipelinewise_spark.transform.compiler import compile_transformations

EVENT_COLS = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
NOW = datetime(2026, 1, 2, 3, 4, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def events(spark):
    df = generate_change_events(
        spark, n_convs=20, turns_per_conv=4, n_updates=100, delete_pct=10
    ).persist()
    df.count()
    yield df
    df.unpersist()


# ----------------------------------------------------------- evolution (F3)

def test_add_column_old_rows_null(spark, tmp_path, events):
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY, num_buckets=4
    )
    merge_into(table, events.where(F.col("lsn") <= 80), batch_id=0)

    from pyspark.sql.types import StructField

    evolved = StructType(
        list(TRANSCRIPT_SCHEMA.fields) + [StructField("lang", StringType())]
    )
    actions = reconcile(table, evolved, now=NOW)
    assert actions == [
        {"action": "add_column", "name": "lang", "type": "string"}
    ]
    assert "lang" in table.data_cols
    # pre-evolution rows read as NULL
    assert table.read().where(F.col("lang").isNotNull()).count() == 0

    tail = events.where(F.col("lsn") > 80).withColumn(
        "lang", F.lit("en")
    )
    merge_into(table, tail, batch_id=1)
    df = table.read()
    assert df.where(F.col("lang") == "en").count() > 0
    assert df.where(F.col("lang").isNull()).count() > 0  # untouched rows


def test_type_change_versions_column(spark, tmp_path, events):
    table = LakeTable.create(
        spark, str(tmp_path / "t2"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY, num_buckets=4
    )
    merge_into(table, events.where(F.col("lsn") <= 80), batch_id=0)
    old_tools = {
        (r["conv_id"], r["turn_idx"]): r["tool"]
        for r in table.read().where(F.col("tool").isNotNull()).collect()
    }
    assert old_tools

    # tool: string → bigint (type change → version per schema_changes.rst)
    evolved = StructType(
        [f if f.name != "tool" else type(f)("tool", LongType()) for f in TRANSCRIPT_SCHEMA.fields]
    )
    actions = reconcile(table, evolved, now=NOW)
    assert actions == [
        {
            "action": "version_column",
            "name": "tool",
            "type": "long",
            "versioned_name": "tool_20260102_0304",
        }
    ]
    df = table.read()
    assert "tool_20260102_0304" in df.columns and "tool" in df.columns
    # historical values preserved under the versioned name, NOT converted
    versioned = {
        (r["conv_id"], r["turn_idx"]): r["tool_20260102_0304"]
        for r in df.where(F.col("tool_20260102_0304").isNotNull()).collect()
    }
    assert versioned == old_tools
    assert df.where(F.col("tool").isNotNull()).count() == 0
    assert df.schema["tool"].dataType == LongType()

    # new-typed data merges into the fresh column
    tail = events.where(F.col("lsn") > 80).withColumn("tool", F.lit(7).cast("long"))
    merge_into(table, tail, batch_id=1)
    assert table.read().where(F.col("tool") == 7).count() > 0


def test_dropped_source_column_is_kept(spark, tmp_path, events):
    table = LakeTable.create(
        spark, str(tmp_path / "t3"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY, num_buckets=4
    )
    merge_into(table, events.where(F.col("lsn") <= 80), batch_id=0)
    narrowed = StructType([f for f in TRANSCRIPT_SCHEMA.fields if f.name != "tool"])
    assert diff_schemas(table, narrowed, now=NOW) == []  # never drops
    # merging events without the column null-backfills only the new rows
    merge_into(table, events.where(F.col("lsn") > 80).drop("tool"), batch_id=1)
    assert "tool" in table.read().columns


def test_key_type_change_rejected(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "t4"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY, num_buckets=4
    )
    evolved = StructType(
        [f if f.name != "turn_idx" else type(f)("turn_idx", LongType()) for f in TRANSCRIPT_SCHEMA.fields]
    )
    with pytest.raises(ValueError, match="key column"):
        reconcile(table, evolved, now=NOW)
    reconcile(table, evolved, now=NOW, allow_key_type_change=True)
    assert "turn_idx_20260102_0304" in [
        f["logical"] for f in table.manifest["fields"]
    ]


# ----------------------------------------------------------- transforms DSL

def test_mask_transforms(spark):
    df = spark.createDataFrame(
        [("alice@example.com", "secret-token-12345", 42.5, "2024-06-15 10:20:30", "user"),
         ("bob@example.com", "xy", 7.0, "2023-03-01 01:02:03", "assistant")],
        "email string, secret string, amount double, created string, role string",
    ).withColumn("created", F.to_timestamp("created"))
    fn = compile_transformations(
        [
            {"field_id": "email", "type": "HASH"},
            {"field_id": "secret", "type": "MASK-STRING-SKIP-ENDS-3"},
            {"field_id": "amount", "type": "MASK-NUMBER"},
            {"field_id": "created", "type": "MASK-DATE"},
        ]
    )
    rows = {r["role"]: r for r in fn(df).collect()}
    import hashlib

    assert rows["user"]["email"] == hashlib.sha256(b"alice@example.com").hexdigest()
    assert rows["user"]["secret"] == "sec************345"
    assert rows["assistant"]["secret"] == "**"  # len ≤ 2n → all stars
    assert rows["user"]["amount"] == 0
    assert str(rows["user"]["created"]) == "2024-01-01 10:20:30"


def test_conditional_and_skip_first_transforms(spark):
    df = spark.createDataFrame(
        [("conv-1", "user", "hello world", '{"pii": "yes"}'),
         ("conv-1", "assistant", "fine text", '{"pii": "no"}')],
        "conv_id string, role string, text string, props string",
    )
    fn = compile_transformations(
        [
            {
                "field_id": "text",
                "type": "SET-NULL",
                "when": [
                    {"column": "role", "equals": "user"},
                    {"column": "props", "field_path": "pii", "regex_match": "y.*"},
                ],
            },
            {"field_id": "conv_id", "type": "HASH-SKIP-FIRST-5"},
        ]
    )
    rows = {r["role"]: r for r in fn(df).collect()}
    assert rows["user"]["text"] is None
    assert rows["assistant"]["text"] == "fine text"
    import hashlib

    assert rows["user"]["conv_id"] == "conv-" + hashlib.sha256(b"1").hexdigest()


def test_hidden_mask_and_stream_scoping(spark):
    df = spark.createDataFrame([("s", "x")], "a string, b string")
    fn = compile_transformations(
        [
            {"field_id": "a", "type": "MASK-HIDDEN", "tap_stream_name": "other"},
            {"field_id": "b", "type": "MASK-HIDDEN", "tap_stream_name": "this"},
        ],
        stream="this",
    )
    r = fn(df).collect()[0]
    assert r["a"] == "s" and r["b"] == "hidden"


# -------------------------------------------------------- snapshot+tail (F4)

def test_snapshot_plus_overlapping_tail(spark, tmp_path, events):
    """Snapshot taken at lsn_snap=120 (reflects events ≤120); lsn₀=100
    captured BEFORE the export; tail replays from >100. Overlap
    (100,120] re-applies convergently; final state == full fold."""
    rows = [r.asDict() for r in events.select(*EVENT_COLS).collect()]
    snap_state = fold_events([r for r in rows if r["lsn"] <= 120], TRANSCRIPT_KEY)
    snapshot = spark.createDataFrame(
        [
            {k: v for k, v in rec.items() if k in [f.name for f in TRANSCRIPT_SCHEMA.fields]}
            for rec in snap_state.values()
        ],
        TRANSCRIPT_SCHEMA,
    )
    table = LakeTable.create(
        spark, str(tmp_path / "t5"), TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY, num_buckets=4
    )
    initial_load(table, snapshot, lsn0=100, stream="s")
    assert table.bookmarks["s"]["lsn"] == 100
    assert table.read().count() == len(snap_state)

    merge_into(table, events, batch_id=0, stream="s")  # full tail incl. ≤100
    expected = fold_events(rows, TRANSCRIPT_KEY)
    actual = {(d["conv_id"], d["turn_idx"]): d.asDict() for d in table.read().collect()}
    assert set(actual) == set(expected)
    for k, exp in expected.items():
        assert actual[k]["text"] == exp["text"], k
