"""CLI verb parity: vault secrets, project validation/import, reset_state,
partial_sync_table, pidfile/stop_tap (reference ``cli/__init__.py``
COMMANDS)."""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipelinewise_spark import vault
from pipelinewise_spark.cdc.events import TRANSCRIPT_KEY, TRANSCRIPT_SCHEMA
from pipelinewise_spark.cdc.merge import merge_into
from pipelinewise_spark.cdc.partial import partial_sync
from pipelinewise_spark.config import load_tap_yaml, load_yaml
from pipelinewise_spark.lake.table import LakeTable
from pipelinewise_spark.project_schema import (
    ProjectValidationError,
    TAP_SCHEMA,
    validate_config,
    validate_project_dir,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ------------------------------------------------------------------ vault


def test_vault_roundtrip_and_failures():
    ct = vault.encrypt("p@ss wörd\n", "master")
    assert ct.splitlines()[0] == "$ANSIBLE_VAULT;1.1;AES256"
    assert all(len(ln) <= 80 for ln in ct.splitlines()[1:])
    assert vault.decrypt_text(ct, "master") == "p@ss wörd\n"
    with pytest.raises(vault.VaultError, match="HMAC"):
        vault.decrypt(ct, "wrong")
    lines = ct.strip().splitlines()
    flip = "0" if lines[2][-1] != "0" else "1"
    lines[2] = lines[2][:-1] + flip
    with pytest.raises(vault.VaultError, match="HMAC"):
        vault.decrypt("\n".join(lines), "master")
    with pytest.raises(vault.VaultError, match="header"):
        vault.decrypt("not vault data", "master")


@pytest.mark.parametrize("pt", ["", "x", "a" * 16, "b" * 31, "é" * 16])
def test_vault_padding_edges(pt):
    assert vault.decrypt_text(vault.encrypt(pt, "k"), "k") == pt


def test_vault_12_header_with_id():
    ct = vault.encrypt("v", "k", vault_id="prod")
    assert ct.splitlines()[0] == "$ANSIBLE_VAULT;1.2;AES256;prod"
    assert vault.decrypt_text(ct, "k") == "v"


def _secret_file(tmp_path, pw="master"):
    f = tmp_path / "vault_pass.txt"
    f.write_text(pw + "\n")
    return str(f)


def test_load_yaml_decrypts_inline_vault(tmp_path):
    sec = _secret_file(tmp_path)
    enc = vault.encrypt("db-secret", "master")
    yml = "db_conn:\n  password: !vault |\n" + "\n".join(
        "    " + ln for ln in enc.strip().splitlines()
    )
    cfg = load_yaml(yml, vault_secret=sec)
    assert cfg["db_conn"]["password"] == "db-secret"
    # same YAML without the secret: loud, not ciphertext-pass-through
    with pytest.raises(ValueError, match="vault-encrypted"):
        load_yaml(yml)


def test_load_yaml_whole_file_envelope(tmp_path):
    sec = _secret_file(tmp_path)
    body = "id: t\ntype: tap-mysql\nschemas: []\n"
    f = tmp_path / "enc.yml"
    f.write_text(vault.encrypt(body, "master"))
    assert load_yaml(str(f), vault_secret=sec)["id"] == "t"
    with pytest.raises(ValueError, match="vault-encrypted"):
        load_yaml(str(f))


def test_load_yaml_vault_in_comment_is_fine():
    cfg = load_yaml("password: plain  # or a !vault block\n")
    assert cfg["password"] == "plain"


# ------------------------------------------------------- project validation


def _valid_tap_yaml():
    return textwrap.dedent(
        """
        id: tap_one
        type: tap-mysql
        target: lake
        db_conn: {host: h, port: 3306, dbname: d}
        schemas:
          - source_schema: s
            target_schema: t
            tables:
              - table_name: conv
                replication_method: LOG_BASED
                key_properties: [conv_id, turn_idx]
              - table_name: users
                replication_method: INCREMENTAL
                replication_key: updated_at
                transformations:
                  - column: email
                    type: HASH
                  - column: ip
                    type: SET-NULL
                    when:
                      - column: kind
                        equals: personal
        """
    )


def test_tap_schema_accepts_valid():
    import yaml

    assert validate_config(yaml.safe_load(_valid_tap_yaml()), TAP_SCHEMA) == []


def test_tap_schema_rejects_incremental_without_key():
    import yaml

    cfg = yaml.safe_load(_valid_tap_yaml())
    del cfg["schemas"][0]["tables"][1]["replication_key"]
    assert validate_config(cfg, TAP_SCHEMA)


def test_tap_schema_rejects_unknown_transform_type():
    import yaml

    cfg = yaml.safe_load(_valid_tap_yaml())
    cfg["schemas"][0]["tables"][1]["transformations"][0]["type"] = "ROT13"
    errs = validate_config(cfg, TAP_SCHEMA)
    assert any("transformations" in e for e in errs)


def test_tap_schema_accepts_parameterized_transforms():
    import yaml

    cfg = yaml.safe_load(_valid_tap_yaml())
    cfg["schemas"][0]["tables"][1]["transformations"][0]["type"] = (
        "HASH-SKIP-FIRST-4"
    )
    assert validate_config(cfg, TAP_SCHEMA) == []


def _write_project(tmp_path, tap_text=None, target_text=None):
    d = tmp_path / "proj"
    d.mkdir(exist_ok=True)
    (d / "target_lake.yml").write_text(
        target_text
        or "id: lake\ntype: target-lake\npath: /mnt/lake\n"
    )
    (d / "tap_one.yml").write_text(tap_text or _valid_tap_yaml())
    return str(d)


def test_validate_project_dir_ok(tmp_path):
    res = validate_project_dir(_write_project(tmp_path))
    assert set(res["taps"]) == {"tap_one"} and set(res["targets"]) == {"lake"}


def test_validate_project_dir_dangling_target(tmp_path):
    d = _write_project(
        tmp_path, tap_text=_valid_tap_yaml().replace("target: lake", "target: nope")
    )
    with pytest.raises(ProjectValidationError, match="does not match"):
        validate_project_dir(d)


def test_validate_project_dir_duplicate_streams(tmp_path):
    bad = _valid_tap_yaml().replace("table_name: users", "table_name: conv")
    with pytest.raises(ProjectValidationError, match="duplicate stream"):
        validate_project_dir(_write_project(tmp_path, tap_text=bad))


def test_validate_project_dir_empty(tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    with pytest.raises(ProjectValidationError, match="no tap"):
        validate_project_dir(str(d))


# ------------------------------------------------------------ CLI verbs


def _cli(argv, cwd=None):
    from jobs.cli import main

    old = os.getcwd()
    try:
        if cwd:
            os.chdir(cwd)
        return main(argv)
    finally:
        os.chdir(old)


def test_cli_init_validate_import_roundtrip(tmp_path):
    assert _cli(["init", "--name", "proj"], cwd=str(tmp_path)) == 0
    proj = tmp_path / "proj"
    assert (proj / "tap_mysql.yml.sample").exists()
    # second init refuses to clobber
    assert _cli(["init", "--name", "proj"], cwd=str(tmp_path)) == 1
    for f in proj.glob("*.sample"):
        f.rename(proj / f.name[: -len(".sample")])
    assert _cli(["validate", "--dir", str(proj)]) == 0
    out = tmp_path / "cfg"
    assert _cli(["import", "--dir", str(proj), "--out", str(out)]) == 0
    doc = json.loads(
        (out / "lake" / "mysql_sample" / "config.json").read_text()
    )
    assert "my_db-conversations" in doc["stream_ids"]
    assert (
        doc["streams"]["my_db-users"]["reader"]["function"]
        == "incremental_reader"
    )
    # --taps filter rejects unknown ids
    assert (
        _cli(["import", "--dir", str(proj), "--out", str(out), "--taps", "zzz"])
        == 1
    )


def test_cli_encrypt_string_decrypts_back(tmp_path, capsys):
    sec = _secret_file(tmp_path, "pw1")
    assert (
        _cli(["encrypt_string", "--secret", sec, "--string", "s3cret",
              "--name", "password"]) == 0
    )
    out = capsys.readouterr().out
    assert out.startswith("password: !vault |")
    payload = "\n".join(
        ln.strip() for ln in out.splitlines()[1:] if ln.strip()
    )
    assert vault.decrypt_text(payload, "pw1") == "s3cret"


def test_cli_test_tap_connection_files_ok_and_jdbc_fail(tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    tap = tmp_path / "tap_files.yml"
    tap.write_text(
        textwrap.dedent(
            f"""
            id: files_tap
            type: tap-s3-csv
            db_conn: {{bucket: "x", s3_key_prefix: "y/"}}
            schemas:
              - source_schema: s
                tables: [{{table_name: t}}]
            """
        )
    )
    # s3a path -> skip, no failure
    assert _cli(["test_tap_connection", "--project", str(tap)]) == 0
    # unreachable jdbc host -> fail fast
    tap2 = tmp_path / "tap_db.yml"
    tap2.write_text(
        _valid_tap_yaml()
        .replace("host: h", "host: 127.0.0.1")
        .replace("port: 3306", "port: 1")
    )
    assert (
        _cli(["test_tap_connection", "--project", str(tap2),
              "--timeout", "0.3"]) == 1
    )


# ------------------------------------------------- reset_state (end-to-end)


def _mk_events(spark, rows):
    """rows: (conv_id, turn_idx, op, lsn) → change-event DataFrame."""
    from pyspark.sql import functions as F

    data = [
        (cid, ti, f"t-{cid}-{ti}-{lsn}", op, lsn) for cid, ti, op, lsn in rows
    ]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, text string, op string, lsn long"
    )
    return (
        df.withColumn("role", F.lit("user"))
        .withColumn("tool", F.lit(None).cast("string"))
        .withColumn("ts", F.current_timestamp())
    )


def test_reset_state_rewinds_and_clears_guard(spark, tmp_path):
    path = str(tmp_path / "t_reset")
    t = LakeTable.create(spark, path, TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY)
    merge_into(t, _mk_events(spark, [("c1", 0, "I", 10), ("c1", 1, "I", 11)]),
               stream="s1", batch_id=0, pipeline_id="p1")
    assert t.bookmarks["s1"]["lsn"] == 11
    assert t.applied_batch_ids("p1") == {0}

    rc = _cli(["reset_state", "--table", path, "--stream", "s1",
               "--lsn", "5", "--clear-pipeline", "p1"])
    assert rc == 0
    t.refresh()
    assert t.bookmarks["s1"]["lsn"] == 5
    assert t.applied_batch_ids("p1") == set()
    # the rewound window replays: batch_id 0 from a fresh checkpoint is
    # NOT swallowed by the old guard, and lsn 10/11 pass the bookmark
    # filter again
    m = merge_into(
        t, _mk_events(spark, [("c1", 0, "U", 10), ("c1", 2, "I", 11)]),
        stream="s1", batch_id=0, pipeline_id="p1",
    )
    assert not m.get("skipped")
    assert t.bookmarks["s1"]["lsn"] == 11

    # unknown stream refused without --create
    assert _cli(["reset_state", "--table", path, "--stream", "zzz",
                 "--lsn", "1"]) == 1
    assert _cli(["reset_state", "--table", path, "--stream", "zzz",
                 "--lsn", "1", "--create"]) == 0
    assert t.refresh().bookmarks["zzz"]["lsn"] == 1


def test_reset_state_clear_all_pipelines(spark, tmp_path):
    """--clear-all-pipelines wipes every guard — the operator never chose
    the internal pipeline id (project mode uses CdcPipeline's default), so
    rewind-then-replay must not depend on knowing it."""
    path = str(tmp_path / "t_reset_all")
    t = LakeTable.create(spark, path, TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY)
    merge_into(t, _mk_events(spark, [("c1", 0, "I", 10)]),
               stream="s1", batch_id=0, pipeline_id="default")
    merge_into(t, _mk_events(spark, [("c2", 0, "I", 11)]),
               stream="s1", batch_id=0, pipeline_id="other")
    assert t.applied_batch_ids("default") == {0}
    assert t.applied_batch_ids("other") == {0}

    rc = _cli(["reset_state", "--table", path, "--stream", "s1",
               "--lsn", "0", "--clear-all-pipelines"])
    assert rc == 0
    t.refresh()
    assert t.bookmarks["s1"]["lsn"] == 0
    assert t.applied_batch_ids("default") == set()
    assert t.applied_batch_ids("other") == set()
    # batch 0 under the previously-guarded default id now re-applies
    m = merge_into(t, _mk_events(spark, [("c1", 0, "U", 10)]),
                   stream="s1", batch_id=0, pipeline_id="default")
    assert not m.get("skipped")
    assert t.bookmarks["s1"]["lsn"] == 10


# --------------------------------------- compact / vacuum (maintenance)


def test_cli_compact_and_vacuum(spark, tmp_path, capsys):
    root = tmp_path / "lake"
    path = str(root / "t_maint")
    t = LakeTable.create(spark, path, TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY)
    merge_into(t, _mk_events(spark, [("c1", 0, "I", 1), ("c2", 0, "I", 2)]),
               stream="s1", batch_id=0, mode="mor")
    merge_into(t, _mk_events(spark, [("c1", 0, "U", 3)]),
               stream="s1", batch_id=1, mode="mor")
    assert any(fl for fl in t.manifest.get("deltas", {}).values())

    # compact via --root walk: folds the deltas into the base
    assert _cli(["compact", "--root", str(root)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out[0]["table"] == path and out[0]["compacted"]
    t.refresh()
    assert not any(fl for fl in t.manifest.get("deltas", {}).values())
    rows = {(r["conv_id"], r["turn_idx"]): r["text"]
            for r in t.read().collect()}
    assert rows == {("c1", 0): "t-c1-0-3", ("c2", 0): "t-c2-0-2"}

    # vacuum (Spark-free): superseded manifests + unreferenced files go
    assert _cli(["vacuum", "--table", path, "--min-age-sec", "0"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["tables"][0]["removed_manifests"] > 0
    assert t.refresh().read().count() == 2

    # usage errors: both/neither of --table/--root
    assert _cli(["vacuum", "--table", path, "--root", str(root)]) == 1
    assert _cli(["vacuum"]) == 1
    assert _cli(["compact", "--table", str(tmp_path / "nope")]) == 1


# --------------------------------------------- partial sync (end-to-end)


def test_partial_sync_merges_and_deletes_vanished(spark, tmp_path):
    from pyspark.sql import functions as F

    path = str(tmp_path / "t_partial")
    t = LakeTable.create(spark, path, TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY)
    merge_into(
        t,
        _mk_events(
            spark,
            [("a", i, "I", i + 1) for i in range(5)]
            + [("z", 0, "I", 9)],  # outside the range
        ),
        stream="s1", batch_id=0,
    )
    # export of range turn_idx in [1,3] for conv a: turn 1 updated,
    # turn 2 VANISHED upstream, turn 6 new
    export = spark.createDataFrame(
        [("a", 1, "updated"), ("a", 3, "t-a-3-4"), ("a", 6, "new-in-range")],
        "conv_id string, turn_idx int, text string",
    )
    # range on turn_idx [1,6]; conv filter not needed for this table
    res = partial_sync(
        t, export, column="turn_idx", start=1, end=6, stream="s1"
    )
    assert sum(v or 0 for k, v in res.items()
               if isinstance(v, int) and k != "batch_id") > 0
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in t.to_df().collect()
    }
    assert got[("a", 1)] == "updated"
    assert ("a", 2) not in got          # vanished -> hard-deleted
    assert got[("a", 6)] == "new-in-range"
    assert got[("a", 0)] == "t-a-0-1"   # outside range: untouched
    assert ("z", 0) in got              # other conv, turn 0 outside range
    # bookmark advanced past the synthetic lsn
    assert t.bookmarks["s1"]["lsn"] > 5


def test_partial_sync_stream_mismatch_still_applies(spark, tmp_path):
    """Default lsn is the MAX over ALL bookmarks + 1: a --stream name
    that doesn't match the one the CDC pipeline wrote under must not
    stamp an lsn below the stored _lsn (where every upsert/delete would
    silently classify as stale and the sync would no-op with exit 0)."""
    path = str(tmp_path / "t_partial_mismatch")
    t = LakeTable.create(spark, path, TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY)
    merge_into(t, _mk_events(spark, [("a", 1, "I", 1000), ("a", 2, "I", 1001)]),
               stream="my_db-users", batch_id=0)
    export = spark.createDataFrame(
        [("a", 1, "rewritten")], "conv_id string, turn_idx int, text string"
    )
    res = partial_sync(t, export, column="turn_idx", start=1, end=3)
    assert res["updated"] == 1 and res["deleted"] == 1
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t.to_df().collect()}
    assert got == {("a", 1): "rewritten"}


def test_partial_sync_string_bounds_on_timestamp_column(spark, tmp_path):
    """String CLI bounds against a timestamp column: stats pruning is
    skipped (int stats vs str bounds → TypeError), the row-level
    between() still reconciles correctly instead of crashing."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "t_partial_ts")
    t = LakeTable.create(spark, path, TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY)
    merge_into(t, _mk_events(spark, [("a", 1, "I", 1), ("a", 2, "I", 2)]),
               stream="s1", batch_id=0)
    export = (
        spark.createDataFrame(
            [("a", 1, "updated")], "conv_id string, turn_idx int, text string"
        ).withColumn("ts", F.to_timestamp(F.lit("2026-01-15 00:00:00")))
    )
    res = partial_sync(t, export, column="ts",
                       start="2026-01-01", end="2026-02-01", stream="s1")
    assert res["updated"] == 1


def test_partial_sync_rejects_out_of_range_export(spark, tmp_path):
    path = str(tmp_path / "t_partial2")
    t = LakeTable.create(spark, path, TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY)
    export = spark.createDataFrame(
        [("a", 99, "way-out")], "conv_id string, turn_idx int, text string"
    )
    with pytest.raises(ValueError, match="outside"):
        partial_sync(t, export, column="turn_idx", start=1, end=3)


def test_partial_sync_no_hard_delete_keeps_vanished(spark, tmp_path):
    path = str(tmp_path / "t_partial3")
    t = LakeTable.create(spark, path, TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY)
    merge_into(t, _mk_events(spark, [("a", 1, "I", 1), ("a", 2, "I", 2)]),
               stream="s1", batch_id=0)
    export = spark.createDataFrame(
        [("a", 1, "updated")], "conv_id string, turn_idx int, text string"
    )
    partial_sync(t, export, column="turn_idx", start=1, end=3,
                 stream="s1", hard_delete=False)
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in t.to_df().collect()}
    assert got[("a", 1)] == "updated" and ("a", 2) in got


def test_partial_sync_soft_delete_does_not_retombstone(spark, tmp_path):
    """Soft-delete tables keep tombstones visible in read(); the
    vanish-delete anti-join must exclude them, or EVERY resync re-emits
    D ops for all historically-deleted keys in the range at a fresh LSN
    (re-tombstoning them, bucket rewrites growing with all-time
    deletes, spurious D rows in the change feed)."""
    path = str(tmp_path / "t_partial_soft")
    t = LakeTable.create(spark, path, TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY,
                         properties={"soft_delete": True})
    merge_into(t, _mk_events(spark, [("a", 1, "I", 1), ("a", 2, "I", 2)]),
               stream="s1", batch_id=0)
    merge_into(t, _mk_events(spark, [("a", 2, "D", 3)]),
               stream="s1", batch_id=1)
    tomb_lsn_before = {
        r["turn_idx"]: r["_lsn"]
        for r in t.read(include_tombstones=True).where(
            "_sdc_deleted_at IS NOT NULL").collect()
    }
    assert tomb_lsn_before == {2: 3}
    # resync covering the tombstoned key's range; the export legitimately
    # doesn't contain the deleted key — that's not a NEW vanish
    export = spark.createDataFrame(
        [("a", 1, "resynced")], "conv_id string, turn_idx int, text string"
    )
    res = partial_sync(t, export, column="turn_idx", start=1, end=3,
                       stream="s1")
    assert res.get("tombstoned", 0) == 0 and res.get("deleted", 0) == 0
    tomb_after = {
        r["turn_idx"]: r["_lsn"]
        for r in t.refresh().read(include_tombstones=True).where(
            "_sdc_deleted_at IS NOT NULL").collect()
    }
    assert tomb_after == tomb_lsn_before  # original tombstone, original lsn
    got = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in t.read().where("_sdc_deleted_at IS NULL").collect()}
    assert got == {("a", 1): "resynced"}


def test_partial_sync_default_lsn_survives_reset_state(spark, tmp_path):
    """reset_state rewinds bookmarks BELOW stored row _lsn values; a
    partial sync whose default lsn derives only from bookmarks would
    stamp under the floor and silently classify every row as stale
    (merge keeps the old rows, {'rows': 0}). The manifest's per-file
    _lsn bounds provide the floor."""
    path = str(tmp_path / "t_partial_reset")
    t = LakeTable.create(spark, path, TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY)
    merge_into(t, _mk_events(spark, [("a", 1, "I", 500), ("a", 2, "I", 501)]),
               stream="s1", batch_id=0)
    t.reset_state(bookmarks={"s1": {"lsn": 1}}, clear_pipelines="*")
    export = spark.createDataFrame(
        [("a", 1, "post-rewind")], "conv_id string, turn_idx int, text string"
    )
    res = partial_sync(t, export, column="turn_idx", start=1, end=2,
                       stream="s1")
    assert res["updated"] == 1 and res["deleted"] == 1
    got = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in t.refresh().read().collect()}
    assert got == {("a", 1): "post-rewind"}


def test_cli_partial_sync_table_from_parquet(spark, tmp_path):
    path = str(tmp_path / "t_partial_cli")
    t = LakeTable.create(spark, path, TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY)
    merge_into(t, _mk_events(spark, [("a", 1, "I", 1), ("a", 2, "I", 2)]),
               stream="s1", batch_id=0)
    src = str(tmp_path / "export.parquet")
    spark.createDataFrame(
        [("a", 1, "cli-updated")], "conv_id string, turn_idx int, text string"
    ).write.parquet(src)
    rc = _cli([
        "partial_sync_table", "--table", path, "--stream", "s1",
        "--column", "turn_idx", "--start_value", "1", "--end_value", "1",
        "--source-parquet", src,
    ])
    assert rc == 0
    got = {(r["conv_id"], r["turn_idx"]): r["text"]
           for r in t.refresh().to_df().collect()}
    assert got[("a", 1)] == "cli-updated" and ("a", 2) in got


def test_cli_sync_tables_verb_forwards(spark, tmp_path):
    """The `sync_tables` verb is a pure forwarder onto run_cdc
    --project --sync-tables (semantics fully covered in
    test_round6_features.test_sync_tables_verb); this proves the verb
    wiring end-to-end: selected stream resynced to the snapshot with
    its bookmark at lsn0."""
    from pyspark.sql import functions as F

    from pipelinewise_spark.cdc.gen import generate_change_events
    from tests.test_project_config import TAP_YAML

    tap = tmp_path / "tap.yml"
    tap.write_text(TAP_YAML)
    ev = generate_change_events(
        spark, n_convs=3, turns_per_conv=2, n_updates=4, delete_pct=0,
        stream="my_db-conversations",
    ).unionByName(generate_change_events(
        spark, n_convs=2, turns_per_conv=2, n_updates=2, delete_pct=0,
        stream="my_db-audit",
    ))
    events_dir = str(tmp_path / "events")
    ev.write.parquet(events_dir)
    lake = str(tmp_path / "lake")
    assert _cli(["run_tap", "--project", str(tap), "--table", lake,
                 "--events", events_dir,
                 "--checkpoint", str(tmp_path / "ck"),
                 "--num-buckets", "4"]) == 0

    snap = spark.createDataFrame(
        [("conv-v", 0, "user", "verb resync", None)],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.timestamp_seconds(F.lit(1704067200)))
    snap_dir = tmp_path / "snaps"
    snap_dir.mkdir()
    snap.write.parquet(str(snap_dir / "my_db-conversations.parquet"))

    assert _cli([
        "sync_tables", "--project", str(tap), "--tables",
        "my_db-conversations", "--table", lake, "--events", events_dir,
        "--checkpoint", str(tmp_path / "ck"), "--snapshot", str(snap_dir),
        "--lsn0", "9000",
    ]) == 0
    conv = LakeTable(spark, f"{lake}/repl_my_db/conversations")
    assert conv.read().count() == 1
    assert conv.bookmarks["my_db-conversations"]["lsn"] == 9000
    # untouched sibling stream
    audit = LakeTable(spark, f"{lake}/repl_my_db/audit")
    assert audit.read().count() == 4


# --------------------------------------------------- pidfile / stop_tap


def test_run_cdc_pidfile_refuses_live_pid(tmp_path):
    from jobs.run_cdc import main as run_cdc_main

    pf = tmp_path / "tap.pid"
    pf.write_text(str(os.getpid()))  # us: definitely alive
    rc = run_cdc_main(["--table", str(tmp_path / "t"), "--pidfile", str(pf)])
    assert rc == 1
    assert pf.read_text() == str(os.getpid())  # untouched


def test_stop_tap_terminates_pidfile_process(tmp_path):
    pf = tmp_path / "tap.pid"
    child = subprocess.Popen(
        [sys.executable, "-c",
         "import signal,sys,time\n"
         "signal.signal(signal.SIGTERM, lambda *_: sys.exit(0))\n"
         "time.sleep(60)"],
    )
    pf.write_text(str(child.pid))
    try:
        assert _cli(["stop_tap", "--pidfile", str(pf), "--timeout", "20"]) == 0
        # 0 = graceful handler ran; -SIGTERM = signal landed before the
        # handler was installed — either way the tap stopped
        assert child.wait(timeout=10) in (0, -signal.SIGTERM)
    finally:
        if child.poll() is None:
            child.kill()
    # second stop: stale file -> error + cleanup
    pf.write_text(str(child.pid))
    assert _cli(["stop_tap", "--pidfile", str(pf)]) == 1
    assert not pf.exists()


def test_pidfile_zero_and_empty_are_stale_not_self_signals(tmp_path):
    """pid 0 targets the caller's OWN process group: os.kill(0, 0)
    always 'succeeds' and SIGTERM would kill the CLI and its shell —
    both verbs must treat 0/empty/negative as corrupt, never signal."""
    from jobs.run_cdc import main as run_cdc_main

    # stop_tap: '0' pidfile -> clean error, no SIGTERM storm
    pf = tmp_path / "z.pid"
    for content in ("0", "-5", ""):
        pf.write_text(content)
        assert _cli(["stop_tap", "--pidfile", str(pf)]) == 1

    # run_cdc: an empty pidfile is STALE (reclaimed + overwritten with
    # our pid), not a live "pid 0" refusing startup forever; the run
    # itself then dies on the bogus events path — irrelevant here
    pf.write_text("")
    try:
        run_cdc_main(["--table", str(tmp_path / "t"), "--mode", "replay",
                      "--events", str(tmp_path / "no-events"),
                      "--pidfile", str(pf)])
    except BaseException:
        pass
    assert pf.read_text() == str(os.getpid())


def test_reset_state_rejects_plain_string_pipelines(spark, tmp_path):
    path = str(tmp_path / "t_reset_str")
    t = LakeTable.create(spark, path, TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY)
    merge_into(t, _mk_events(spark, [("c1", 0, "I", 1)]),
               stream="s1", batch_id=0, pipeline_id="p1")
    with pytest.raises(ValueError, match="list of pipeline ids"):
        t.reset_state(bookmarks={"s1": {"lsn": 0}}, clear_pipelines="p1")
    assert t.refresh().applied_batch_ids("p1") == {0}  # untouched


def test_vault_secret_file_strips_like_ansible(tmp_path):
    p = tmp_path / "pass"
    p.write_bytes(b"  s3cret \n")
    assert vault.load_secret_file(str(p)) == "s3cret"


def test_vacuum_indexes_requires_root(tmp_path, spark):
    path = str(tmp_path / "t_vx")
    LakeTable.create(spark, path, TRANSCRIPT_SCHEMA, TRANSCRIPT_KEY)
    assert _cli(["vacuum", "--table", path, "--indexes"]) == 1
