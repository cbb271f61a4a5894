"""Round-8 ADVICE fixes: gate latest-per-key semantics, quarantine
claimer selection under mixed validate modes, deterministic DLQ retry
dedup, and singer auto-detect on an empty events dir."""

from __future__ import annotations

import json as _json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipelinewise_spark.cdc.events import TRANSCRIPT_KEY, TRANSCRIPT_SCHEMA
from pipelinewise_spark.cdc.pipeline import CdcPipeline, MultiStreamPipeline
from pipelinewise_spark.functions import dedup_index
from pipelinewise_spark.lake.table import LakeTable
from pipelinewise_spark.singer import schema as sschema

BASE = "the quick brown fox jumps over the lazy dog tonight"
NOVEL = "a genuinely novel essay on volcanic gardens and tidal glass"


def test_gate_old_version_cannot_veto_novel_rewrite(spark, tmp_path):
    """ADVICE r7 (medium): a micro-batch carrying an older near-dup text
    AND a novel rewrite of the SAME key must admit the key — admission
    is decided on the key's LATEST version, not on any stale one."""
    idx = str(tmp_path / "mh")
    dedup_index.save_minhash_index(
        idx, spark.createDataFrame([(1, BASE)], "doc_id long, text string"),
        id_col="doc_id", text_col="text", num_hashes=16, bands=8,
        num_buckets=2)
    gate = dedup_index.gate_transform(idx, min_est=0.5)
    batch = spark.createDataFrame(
        [
            (10, BASE + " again", "U", 1),   # stale version, near-dups idx
            (10, NOVEL, "U", 2),             # current version, novel
        ],
        "doc_id long, text string, op string, lsn long",
    )
    out = gate(batch).collect()
    # the key survives, with ALL its versions delivered (the merge's
    # own LSN dedup picks the winner downstream)
    assert {r["doc_id"] for r in out} == {10}
    assert {r["lsn"] for r in out} == {1, 2}


def test_gate_rejected_latest_drops_whole_key(spark, tmp_path):
    """Converse: when the key's LATEST version is the duplicate, no
    older (even novel) version may resurrect the key."""
    idx = str(tmp_path / "mh")
    dedup_index.save_minhash_index(
        idx, spark.createDataFrame([(1, BASE)], "doc_id long, text string"),
        id_col="doc_id", text_col="text", num_hashes=16, bands=8,
        num_buckets=2)
    gate = dedup_index.gate_transform(idx, min_est=0.5)
    batch = spark.createDataFrame(
        [
            (20, NOVEL, "U", 1),             # stale novel version
            (20, BASE + " encore", "U", 2),  # current version: duplicate
        ],
        "doc_id long, text string, op string, lsn long",
    )
    assert gate(batch).collect() == []


def test_quarantine_claimer_prefers_quarantine_pipe(spark, tmp_path):
    """ADVICE r7 (medium): with mixed per-table validate modes, the
    stream-unattributable-garbage claimer must be a pipe that can
    actually QUARANTINE — a lexicographically-first permissive pipe
    would silently drop the line."""
    js = sschema.struct_to_jsonschema(TRANSCRIPT_SCHEMA)
    f = tmp_path / "mixed.singer"
    lines = []
    for stream in ("s-a", "s-b"):
        lines.append(_json.dumps({
            "type": "SCHEMA", "stream": stream, "schema": js,
            "key_properties": list(TRANSCRIPT_KEY)}))
        lines.append(_json.dumps({
            "type": "RECORD", "stream": stream,
            "record": {"conv_id": stream, "turn_idx": 0, "text": "ok",
                       "_sdc_lsn": 1}}))
    lines.append('{"type":"RECORD" garbage beyond parsing')
    f.write_text("\n".join(lines) + "\n")

    pipes = {}
    #  s-a sorts FIRST but is permissive; s-b is the only quarantine pipe
    for stream, mode in (("s-a", "permissive"), ("s-b", "quarantine")):
        t = LakeTable.create(
            spark, str(tmp_path / stream), TRANSCRIPT_SCHEMA,
            TRANSCRIPT_KEY, num_buckets=2)
        pipes[stream] = CdcPipeline(t, stream=stream, validate=mode)
    ms = MultiStreamPipeline(pipes, max_concurrency=1)
    res = ms.ingest_singer_lines(spark.read.text(str(f)), batch_id=0)
    assert res["s-b"]["quarantined"] == 1
    qb = LakeTable(spark, pipes["s-b"].quarantine_path).read().collect()
    assert [r["reason"] for r in qb] == ["unparseable_line"]
    # the permissive pipe ingested its record and quarantined nothing
    assert res["s-a"]["inserted"] == 1
    assert not LakeTable.exists(pipes["s-a"].quarantine_path)


def test_quarantine_direct_ingest_retry_is_deduped(spark, tmp_path):
    """ADVICE r7 (low): a direct (batch_id=None) ingest of the same
    lines re-run must NOT duplicate dead-letter rows — the synthetic
    content-derived batch id folds the replay."""
    js = sschema.struct_to_jsonschema(TRANSCRIPT_SCHEMA)
    f = tmp_path / "s.singer"
    f.write_text("\n".join([
        _json.dumps({"type": "SCHEMA", "stream": "s", "schema": js,
                     "key_properties": list(TRANSCRIPT_KEY)}),
        _json.dumps({"type": "RECORD", "stream": "s",
                     "record": {"conv_id": "c", "turn_idx": 0,
                                "text": "ok", "_sdc_lsn": 1}}),
        '{"type":"RECORD" still garbage',
    ]) + "\n")
    t = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
                         TRANSCRIPT_KEY, num_buckets=2)
    pipe = CdcPipeline(t, stream="s", validate="quarantine")
    lines = spark.read.text(str(f))
    m1 = pipe.ingest_singer_lines(lines, batch_id=None)
    assert m1["quarantined"] == 1
    pipe.ingest_singer_lines(lines, batch_id=None)  # retry, same content
    qt = LakeTable(spark, pipe.quarantine_path)
    assert qt.read().count() == 1  # no duplicate dead letters


def test_singer_autodetect_empty_dir_gives_usage_error(spark, tmp_path):
    """ADVICE r7 (low): launching mode=singer without --stream against
    an events dir with no frame files yet must exit with usage guidance
    (pass --stream), not a schema-inference traceback."""
    from jobs import run_cdc

    empty = tmp_path / "events"
    empty.mkdir()
    with pytest.raises(SystemExit):
        run_cdc.main([
            "--table", str(tmp_path / "t"),
            "--events", str(empty),
            "--checkpoint", str(tmp_path / "ck"),
            "--mode", "singer", "--num-buckets", "2",
        ])
