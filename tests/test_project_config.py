"""Project-config loader: the reference's tap YAML wires the engine
(tables + compiled transformations + multi-stream pipeline + reader
specs) — the switch path for an existing PipelineWise user."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipelinewise_spark.cdc.events import TRANSCRIPT_KEY, TRANSCRIPT_SCHEMA
from pipelinewise_spark.cdc.gen import generate_change_events
from pipelinewise_spark.config import build_project, load_tap_yaml, reader_spec
from pipelinewise_spark.lake.table import LakeTable

TAP_YAML = """
id: "mysql_sample"
name: "Sample MySQL Database"
type: "tap-mysql"
owner: "somebody@example.com"
db_conn:
  host: "dbhost"
  port: 3306
  user: "u"
  password: "p"
  dbname: "appdb"
target: "lake"
batch_size_rows: 5000
schemas:
  - source_schema: "my_db"
    target_schema: "repl_my_db"
    tables:
      - table_name: "conversations"
        replication_method: "LOG_BASED"
        key_properties: ["conv_id", "turn_idx"]
        transformations:
          - column: "text"
            type: "HASH"
          - column: "tool"
            type: "SET-NULL"
            when:
              - column: "role"
                equals: "system"
      - table_name: "audit"
        replication_method: "INCREMENTAL"
        replication_key: "updated_at"
        key_properties: ["conv_id", "turn_idx"]
"""


def _provider(stream):
    return TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY


def test_load_rejects_vault_values():
    with pytest.raises(ValueError, match="vault"):
        load_tap_yaml('db_conn:\n  password: !vault |\n    $ANSIBLE_VAULT\nschemas: []')


def test_load_rejects_non_tap_yaml():
    with pytest.raises(ValueError, match="schemas"):
        load_tap_yaml("just: some\nrandom: yaml\n")


def test_build_project_wires_tables_transforms_and_streams(spark, tmp_path):
    cfg = load_tap_yaml(TAP_YAML)
    proj = build_project(
        spark, cfg, lake_root=str(tmp_path / "lake"),
        schema_provider=_provider, num_buckets=4,
    )
    assert set(proj["tables"]) == {"my_db-conversations", "my_db-audit"}
    assert proj["batch_size_rows"] == 5000
    # tables land at lake_root/<target_schema>/<table_name>
    assert LakeTable.exists(str(tmp_path / "lake/repl_my_db/conversations"))
    assert proj["tables"]["my_db-conversations"].key_cols == ["conv_id", "turn_idx"]

    # drive a mixed batch through the wired pipeline: transformations
    # from the YAML must apply before the merge
    ev_a = generate_change_events(
        spark, n_convs=6, turns_per_conv=3, n_updates=10,
        stream="my_db-conversations",
    )
    ev_b = generate_change_events(
        spark, n_convs=4, turns_per_conv=2, n_updates=6,
        stream="my_db-audit", seed=3,
    )
    res = proj["pipeline"].apply_batch(ev_a.unionByName(ev_b), batch_id=0)
    assert res["my_db-conversations"]["inserted"] > 0
    assert res["my_db-audit"]["inserted"] > 0
    conv = proj["tables"]["my_db-conversations"].read()
    # HASH: every text is a sha256 hex digest now
    assert conv.where(~F.col("text").rlike("^[0-9a-f]{64}$")).count() == 0
    # conditional SET-NULL: system rows lost their tool value
    assert conv.where((F.col("role") == "system") & F.col("tool").isNotNull()).count() == 0
    # the untransformed stream kept raw text
    audit = proj["tables"]["my_db-audit"].read()
    assert audit.where(F.col("text").rlike("^[0-9a-f]{64}$")).count() == 0

    # reopening the same project reuses the existing tables (idempotent)
    proj2 = build_project(
        spark, cfg, lake_root=str(tmp_path / "lake"),
        schema_provider=_provider, num_buckets=4,
    )
    assert proj2["tables"]["my_db-conversations"].version >= 1


def test_reader_specs_reflect_replication_method():
    cfg = load_tap_yaml(TAP_YAML)
    tables = cfg["schemas"][0]["tables"]
    log_spec = reader_spec(cfg, "my_db", tables[0])
    inc_spec = reader_spec(cfg, "my_db", tables[1])
    assert log_spec["module"] == "jdbc" and log_spec["method"] == "LOG_BASED"
    # LOG_BASED's batch spec is its INITIAL LOAD — the snapshot reader
    # (the continuous tail is the streaming pipeline, not a batch read);
    # the partition bounds come from a max-PK probe at bind time
    assert log_spec["function"] == "snapshot_reader"
    assert log_spec["required_at_bind"] == [
        "partition_column", "lower_bound", "upper_bound",
    ]
    assert inc_spec["function"] == "incremental_reader"
    assert inc_spec["kwargs"]["replication_key"] == "updated_at"
    assert inc_spec["kwargs"]["url"] == "jdbc:mysql://dbhost:3306/appdb"
    assert inc_spec["kwargs"]["table"] == "my_db.audit"
    assert inc_spec["required_at_bind"] == ["bookmark"]
    with pytest.raises(ValueError, match="replication_method"):
        reader_spec(cfg, "my_db", {"table_name": "x", "replication_method": "BOGUS"})
    with pytest.raises(ValueError, match="unsupported tap type"):
        reader_spec({"type": "tap-dynamodb"}, "s", {"table_name": "x",
                                                   "replication_method": "FULL_TABLE"})
    # INCREMENTAL without replication_key is a config error caught at
    # spec time (the reference rejects it at import), not at the database
    with pytest.raises(ValueError, match="replication_key"):
        reader_spec(cfg, "my_db", {"table_name": "x",
                                   "replication_method": "INCREMENTAL"})
    # dialect-correct URLs — never a silently-wrong one
    ora = reader_spec(
        {"type": "tap-oracle", "db_conn": {"host": "h", "port": 1521,
                                           "dbname": "svc"}},
        "s", {"table_name": "t", "replication_method": "FULL_TABLE"},
    )
    assert ora["kwargs"]["url"] == "jdbc:oracle:thin:@//h:1521/svc"


def test_build_project_validates_keys_and_soft_delete(spark, tmp_path):
    cfg = load_tap_yaml(TAP_YAML)
    bad = load_tap_yaml(TAP_YAML)
    bad["schemas"][0]["tables"][0]["key_properties"] = ["no_such_col"]
    with pytest.raises(ValueError, match="no_such_col"):
        build_project(spark, bad, lake_root=str(tmp_path / "l1"),
                      schema_provider=_provider, num_buckets=2)
    # soft_delete contradiction against an existing table fails at
    # WIRING time, not as an opaque foreachBatch error mid-stream
    build_project(spark, cfg, lake_root=str(tmp_path / "l2"),
                  schema_provider=_provider, num_buckets=2)
    with pytest.raises(ValueError, match="soft_delete"):
        build_project(spark, cfg, lake_root=str(tmp_path / "l2"),
                      schema_provider=_provider, num_buckets=2,
                      soft_delete=True)


def test_load_tap_yaml_missing_path_is_file_not_found():
    with pytest.raises(FileNotFoundError):
        load_tap_yaml("/no/such/project/tap_mysql.yml")


def test_kafka_tap_wires_offset_based_exactly_once(spark, tmp_path):
    """A tap-kafka project must NOT use the LSN-bookmark prefix filter:
    multi-partition micro-batches follow per-partition offsets, not
    global LSN order, and the filter would drop a lagging partition's
    frames as replays. JDBC taps keep it on (log order IS the
    contract there)."""
    kafka_yaml = """
id: "k"
type: "tap-kafka"
db_conn: {bootstrap_servers: "b:9092", topic: "t"}
target: "lake"
schemas:
  - source_schema: "s"
    tables:
      - table_name: "conversations"
        replication_method: "LOG_BASED"
        key_properties: ["conv_id", "turn_idx"]
"""
    proj = build_project(
        spark, kafka_yaml, lake_root=str(tmp_path / "k"),
        schema_provider=_provider, num_buckets=2,
    )
    pipe = proj["pipeline"].pipelines["s-conversations"]
    assert pipe.filter_applied_lsn is False
    proj2 = build_project(
        spark, TAP_YAML, lake_root=str(tmp_path / "m"),
        schema_provider=_provider, num_buckets=2, widen="promote",
    )
    pipe2 = proj2["pipeline"].pipelines["my_db-conversations"]
    assert pipe2.filter_applied_lsn is True
    assert pipe2.widen == "promote"


def test_validate_records_yaml_forms(spark, tmp_path):
    """Tap-YAML validate_records: reference bool form (true=strict) and
    the engine's string forms all wire through to the pipelines; junk
    values fail YAML validation, not mid-stream."""
    from pipelinewise_spark.project_schema import TAP_SCHEMA, validate_config

    cfg = load_tap_yaml(TAP_YAML)
    for form, expect in [
        (True, "strict"), (False, "permissive"),
        ("quarantine", "quarantine"), ("strict", "strict"),
    ]:
        cfg2 = {**cfg, "validate_records": form}
        assert validate_config(cfg2, TAP_SCHEMA) == []
        proj = build_project(
            spark, cfg2, lake_root=str(tmp_path / f"lake-{form}"),
            schema_provider=_provider, num_buckets=2,
        )
        for pipe in proj["pipeline"].pipelines.values():
            assert pipe.validate == expect, (form, pipe.validate)
    bad = {**cfg, "validate_records": "yolo"}
    assert validate_config(bad, TAP_SCHEMA) != []
