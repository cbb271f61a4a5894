"""Persisted MinHash-LSH dedup index: save/load/probe round-trip,
incremental append / change / delete maintenance, loud failure modes.
Mirrors the ANN index lifecycle tests (test_round5_features.py)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipelinewise_spark.functions import dedup_index

BASE = "the quick brown fox jumps over the lazy dog tonight"


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def corpus(spark):
    return _corpus(spark, [
        (1, BASE),
        (2, BASE + " again"),          # near-dup of 1
        (3, "completely different words about spark shuffles and lakes"),
        (4, BASE.replace("fox", "cat")),
    ])


def test_save_load_probe_roundtrip(spark, tmp_path, corpus):
    path = str(tmp_path / "mh")
    doc = dedup_index.save_minhash_index(
        path, corpus, id_col="doc_id", text_col="text",
        num_hashes=16, bands=4, num_buckets=4,
    )
    assert doc["kind"] == "minhash" and doc["fit_rows"] == 4
    loaded = dedup_index.load_minhash_index(path)
    assert loaded["num_hashes"] == 16 and loaded["bands"] == 4

    # identical text under a NEW id → candidate with est exactly 1.0
    probes = _corpus(spark, [(100, BASE), (101, "unrelated nonsense zz")])
    got = {(r["probe_id"], r["match_id"]): r["est_jaccard"]
           for r in dedup_index.minhash_lookup(spark, path, probes).collect()}
    assert got[(100, 1)] == 1.0
    assert not any(p == 101 for (p, _m) in got), got  # no match for 101
    # near-dups of BASE surface too (share ≥1 band with overwhelming odds)
    assert (100, 2) in got or (100, 4) in got

    # min_est filters
    hi = dedup_index.minhash_lookup(spark, path, probes, min_est=0.999)
    assert {(r["probe_id"], r["match_id"]) for r in hi.collect()} == {(100, 1)}


def test_probe_excludes_self_matches(spark, tmp_path, corpus):
    path = str(tmp_path / "mh")
    dedup_index.save_minhash_index(
        path, corpus, id_col="doc_id", text_col="text", num_buckets=4)
    # probing the corpus itself: a doc never matches its own id
    got = dedup_index.minhash_lookup(spark, path, corpus).collect()
    assert all(r["probe_id"] != r["match_id"] for r in got)
    pairs = {(r["probe_id"], r["match_id"]) for r in got}
    assert (1, 2) in pairs and (2, 1) in pairs  # near-dups, both directions


def test_incremental_append_equals_resave(spark, tmp_path, corpus):
    """Index maintained by increments must answer probes identically to
    an index re-saved from the full corpus."""
    path_inc = str(tmp_path / "inc")
    path_full = str(tmp_path / "full")
    dedup_index.save_minhash_index(
        path_inc, corpus, id_col="doc_id", text_col="text", num_buckets=4)
    new_doc = _corpus(spark, [(5, BASE + " tomorrow")])
    assert dedup_index.append_minhash_rows(path_inc, new_doc) == 1

    full = corpus.unionByName(new_doc)
    dedup_index.save_minhash_index(
        path_full, full, id_col="doc_id", text_col="text", num_buckets=4)

    probes = _corpus(spark, [(100, BASE)])
    a = {(r["probe_id"], r["match_id"], r["est_jaccard"])
         for r in dedup_index.minhash_lookup(spark, path_inc, probes).collect()}
    b = {(r["probe_id"], r["match_id"], r["est_jaccard"])
         for r in dedup_index.minhash_lookup(spark, path_full, probes).collect()}
    assert a == b and any(m == 5 for (_, m, _) in a)


def test_changed_document_replaces_its_rows(spark, tmp_path, corpus):
    """A changed document CoW-replaces all its band rows — the old text
    must stop matching, the new text must start."""
    from pipelinewise_spark.functions.ann_index import _doc_codes_path
    from pipelinewise_spark.lake.table import LakeTable

    path = str(tmp_path / "mh")
    dedup_index.save_minhash_index(
        path, corpus, id_col="doc_id", text_col="text", num_buckets=4)
    changed = _corpus(spark, [(3, BASE + " rewritten")])  # was 'different'
    dedup_index.append_minhash_rows(path, changed)

    doc = dedup_index.load_minhash_index(path)
    t = LakeTable(spark, _doc_codes_path(path, doc))
    per_id = {r["doc_id"]: r["n"] for r in
              t.read().groupBy("doc_id").count()
              .withColumnRenamed("count", "n").collect()}
    assert per_id[3] == doc["bands"]  # replaced, not duplicated

    probes = _corpus(spark, [
        (100, BASE),
        (101, "completely different words about spark shuffles and lakes"),
    ])
    got = {(r["probe_id"], r["match_id"])
           for r in dedup_index.minhash_lookup(spark, path, probes).collect()}
    assert (100, 3) in got        # new text now matches BASE probes
    assert (101, 3) not in got    # old text is gone from the index


def test_delete_removes_all_band_rows(spark, tmp_path, corpus):
    from pipelinewise_spark.functions.ann_index import _doc_codes_path
    from pipelinewise_spark.lake.table import LakeTable

    path = str(tmp_path / "mh")
    dedup_index.save_minhash_index(
        path, corpus, id_col="doc_id", text_col="text", num_buckets=4)
    dedup_index.delete_minhash_ids(
        path, spark.createDataFrame([(1,)], "doc_id long"))

    doc = dedup_index.load_minhash_index(path)
    t = LakeTable(spark, _doc_codes_path(path, doc))
    assert t.read().where("doc_id = 1").count() == 0

    probes = _corpus(spark, [(100, BASE)])
    got = {r["match_id"]
           for r in dedup_index.minhash_lookup(spark, path, probes).collect()}
    assert 1 not in got and got  # ghost gone, near-dups (2/4) still match


def test_duplicate_delta_rejected_and_bad_bands(spark, tmp_path, corpus):
    path = str(tmp_path / "mh")
    with pytest.raises(ValueError, match="divide"):
        dedup_index.save_minhash_index(
            path, corpus, id_col="doc_id", text_col="text",
            num_hashes=16, bands=5)
    dedup_index.save_minhash_index(
        path, corpus, id_col="doc_id", text_col="text", num_buckets=4)
    dupes = _corpus(spark, [(9, "a b"), (9, "a b c")])
    with pytest.raises(ValueError, match="duplicate"):
        dedup_index.append_minhash_rows(path, dupes)
    # empty delta: clean no-op
    assert dedup_index.append_minhash_rows(
        path, _corpus(spark, [])) == 0


def test_update_to_unsignable_text_deletes_band_rows(spark, tmp_path, corpus):
    """A changed document whose NEW text signs to nothing (NULL, empty,
    all-delimiter) must lose its OLD band rows — replace-with-nothing is
    a delete, not a silent skip that leaves a stale signature matching
    probes forever. Mixed deltas (real text + unsignable) split into the
    I and D paths of the same call."""
    from pipelinewise_spark.functions.ann_index import _doc_codes_path
    from pipelinewise_spark.lake.table import LakeTable

    path = str(tmp_path / "mh")
    dedup_index.save_minhash_index(
        path, corpus, id_col="doc_id", text_col="text", num_buckets=4)
    delta = _corpus(spark, [
        (2, ""),             # emptied
        (4, None),           # nulled
        (6, BASE + " anew"), # genuinely new — the I path in the same call
    ])
    assert dedup_index.append_minhash_rows(path, delta) == 3

    doc = dedup_index.load_minhash_index(path)
    t = LakeTable(spark, _doc_codes_path(path, doc))
    left = {r["doc_id"] for r in t.read().select("doc_id").distinct().collect()}
    assert 2 not in left and 4 not in left and 6 in left

    got = {r["match_id"] for r in dedup_index.minhash_lookup(
        spark, path, _corpus(spark, [(100, BASE)])).collect()}
    assert 2 not in got and 4 not in got and {1, 6} <= got

    # an index SAVED over a corpus containing unsignable docs simply
    # doesn't index them (fit_rows counts signed docs only)
    path2 = str(tmp_path / "mh2")
    doc2 = dedup_index.save_minhash_index(
        path2, corpus.unionByName(_corpus(spark, [(7, " "), (8, None)])),
        id_col="doc_id", text_col="text", num_buckets=4)
    assert doc2["fit_rows"] == 4


def test_dedup_gate_admits_only_novel_docs(spark, tmp_path, corpus):
    """The ingest admission gate: near-dups of indexed documents are
    dropped, novel documents pass, and unsignable (NULL/empty) rows
    pass too — the gate drops duplicates, not junk."""
    path = str(tmp_path / "mh")
    dedup_index.save_minhash_index(
        path, corpus, id_col="doc_id", text_col="text", num_buckets=4)
    batch = _corpus(spark, [
        (100, BASE + " again"),  # exact text of indexed doc 2 → dropped
        (101, "genuinely novel prose about volcanic rock gardens"),
        (102, None),             # unsignable → admitted, not swallowed
    ])
    got = {r["doc_id"] for r in dedup_index.dedup_gate(
        spark, path, batch, min_est=0.5).collect()}
    assert got == {101, 102}
    # at a near-1.0 threshold only exact-signature matches are dropped;
    # novel and unsignable docs still pass
    got_hi = {r["doc_id"] for r in dedup_index.dedup_gate(
        spark, path, batch, min_est=0.999).collect()}
    assert {101, 102} <= got_hi


def test_dedup_gate_intra_batch_self_collision(spark, tmp_path, corpus):
    """Two near-dup documents arriving in the SAME ingest batch: the
    index probe alone sees neither (both are novel vs the corpus), so
    without the in-batch pass both pass the gate and both get indexed.
    The pass drops the LARGER id of each priced pair (min-id-wins,
    deterministic), leaves singletons alone, and still lets unsignable
    rows through. in_batch=False restores the probe-only behavior for
    pre-deduped batches."""
    path = str(tmp_path / "mh")
    dedup_index.save_minhash_index(
        path, corpus, id_col="doc_id", text_col="text",
        num_hashes=16, bands=8, num_buckets=4)
    novel = "volcanic rock gardens bloom under the midnight aurora sky"
    batch = _corpus(spark, [
        (200, novel),
        (201, novel + " tonight"),   # in-batch near-dup of 200 → dropped
        (202, "entirely unrelated prose on catalyst join reordering"),
        (203, None),                 # unsignable → admitted
    ])
    got = {r["doc_id"] for r in dedup_index.dedup_gate(
        spark, path, batch, min_est=0.5).collect()}
    assert got == {200, 202, 203}
    # probe-only mode: both members of the in-batch pair pass
    got_off = {r["doc_id"] for r in dedup_index.dedup_gate(
        spark, path, batch, min_est=0.5, in_batch=False).collect()}
    assert got_off == {200, 201, 202, 203}
    # a batch row that near-dups the INDEX is still dropped by the
    # probe pass with in_batch on (the two passes compose)
    mixed = _corpus(spark, [(300, BASE + " again"), (301, novel)])
    got_mixed = {r["doc_id"] for r in dedup_index.dedup_gate(
        spark, path, mixed, min_est=0.5).collect()}
    assert got_mixed == {301}


def test_resave_over_default_layout_doc(spark, tmp_path, corpus):
    """Re-saving over an index.json that predates the codes_dir field
    (default layout) must not crash after the commit; the default
    'codes' dir survives as the reader-grace snapshot."""
    import json

    path = str(tmp_path / "mh")
    dedup_index.save_minhash_index(
        path, corpus, id_col="doc_id", text_col="text", num_buckets=4)
    with open(os.path.join(path, "index.json")) as fh:
        doc = json.load(fh)
    doc.pop("codes_dir")
    with open(os.path.join(path, "index.json"), "w") as fh:
        json.dump(doc, fh)

    doc2 = dedup_index.save_minhash_index(
        path, corpus, id_col="doc_id", text_col="text", num_buckets=4)
    assert doc2["codes_dir"] != "codes"
    assert os.path.isdir(os.path.join(path, "codes"))  # grace snapshot
    got = {r["match_id"] for r in dedup_index.minhash_lookup(
        spark, path, _corpus(spark, [(100, BASE)])).collect()}
    assert 1 in got


def test_probe_scans_index_at_most_twice(spark, tmp_path, corpus):
    """A probe's output plan reads the index at most twice — once for
    the pipelined candidate-pair stream, once for the candidates'
    signature fetch (a third bounded scan builds the tiny match-id set
    during the eager localCheckpoint). r8 note: r7 instead
    localCheckpointed the full candidate PAIR set (24.7M rows at
    sf1.0); materializing only the id set keeps every per-pair pass
    pipelined."""
    path = str(tmp_path / "mh")
    dedup_index.save_minhash_index(
        path, corpus, id_col="doc_id", text_col="text", num_buckets=4)
    probes = _corpus(spark, [(100, BASE)])
    plan = dedup_index.minhash_lookup(spark, path, probes) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 2, plan  # +1 during checkpoint


def test_probe_plan_broadcasts_probe_side(spark, tmp_path, corpus):
    """The index (corpus-sized) must never shuffle on a probe: the plan
    broadcasts the probe band rows into the bucket equi-join."""
    path = str(tmp_path / "mh")
    dedup_index.save_minhash_index(
        path, corpus, id_col="doc_id", text_col="text", num_buckets=4)
    probes = _corpus(spark, [(100, BASE)])
    plan = dedup_index.minhash_lookup(spark, path, probes) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_gate_plan_never_shuffles_index(spark, tmp_path, corpus):
    """The full admission gate (index probe + intra-batch pass + final
    anti-join) keeps the probe's scale shape: the corpus-sized index
    parquet appears at most twice in the output plan (candidate-pair
    stream + signature fetch; the tiny match-id set was checkpointed),
    every join against batch-derived frames is a broadcast, and the
    index side never exchanges. The in-batch self-join operates on the
    checkpointed signature frame only — O(batch), index untouched."""
    path = str(tmp_path / "mh")
    dedup_index.save_minhash_index(
        path, corpus, id_col="doc_id", text_col="text", num_buckets=4)
    batch = _corpus(spark, [(100, BASE), (101, BASE + " encore")])
    plan = dedup_index.dedup_gate(spark, path, batch, min_est=0.5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") <= 2, plan
    assert "BroadcastHashJoin" in plan
    # no sort-merge join anywhere: nothing here should ever need one
    assert "SortMergeJoin" not in plan, plan


# ------------------- property: increments converge to re-save -------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "sphinx of black quartz judge my vow tonight",
    "how vexingly quick daft zebras jump around",
]

_op_st = st.fixed_dictionaries({
    "doc_id": st.integers(min_value=0, max_value=5),
    "kind": st.sampled_from(["set", "set", "empty", "delete"]),
    "text": st.sampled_from(_TEXTS),
})


def _codes_rows(spark, path):
    # Counter, not set: a regression that leaves a duplicate physical
    # row beside the fresh one must fail the convergence comparison
    from collections import Counter

    from pipelinewise_spark.functions.ann_index import _doc_codes_path
    from pipelinewise_spark.lake.table import LakeTable

    doc = dedup_index.load_minhash_index(path)
    return Counter(
        (r["doc_id"], r["band"], r["bkt"], tuple(r["mhs"]))
        for r in LakeTable(spark, _doc_codes_path(path, doc)).read().collect()
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op_st, min_size=1, max_size=10),
       split=st.integers(min_value=1, max_value=9))
def test_random_increments_converge_to_resave(spark, tmp_path_factory,
                                              ops, split):
    """Any interleaving of inserts, updates, updates-to-unsignable, and
    deletes applied INCREMENTALLY (feed-folded last-per-id per batch)
    leaves the index byte-equal in content to a fresh save over the
    final corpus state — the stateless-hashing claim, end to end."""
    tmp = tmp_path_factory.mktemp("mhprop")
    path = str(tmp / "inc")

    state = {0: _TEXTS[0], 1: _TEXTS[1], 2: _TEXTS[2]}
    dedup_index.save_minhash_index(
        path, _corpus(spark, sorted(state.items())),
        id_col="doc_id", text_col="text",
        num_hashes=8, bands=4, num_buckets=2,
    )

    for batch_ops in (ops[:split], ops[split:]):
        if not batch_ops:
            continue
        folded = {}  # last-per-id, as the feed's fold guarantees
        for op in batch_ops:
            folded[op["doc_id"]] = op
        dels = [i for i, op in folded.items() if op["kind"] == "delete"]
        ups = [(i, "" if op["kind"] == "empty" else op["text"])
               for i, op in folded.items() if op["kind"] != "delete"]
        if ups:
            dedup_index.append_minhash_rows(
                path, _corpus(spark, sorted(ups)))
        if dels:
            dedup_index.delete_minhash_ids(
                path, spark.createDataFrame([(i,) for i in sorted(dels)],
                                            "doc_id long"))
        for i, op in folded.items():
            if op["kind"] == "delete":
                state.pop(i, None)
            else:
                state[i] = "" if op["kind"] == "empty" else op["text"]

    full = str(tmp / "full")
    dedup_index.save_minhash_index(
        full, _corpus(spark, sorted(state.items())),
        id_col="doc_id", text_col="text",
        num_hashes=8, bands=4, num_buckets=2,
    )
    assert _codes_rows(spark, path) == _codes_rows(spark, full)


def test_gate_transform_in_cdc_pipeline(spark, tmp_path, corpus):
    """The admission gate as a CdcPipeline transform stage: near-dup
    INSERTs are dropped before the merge, novel ones land, DELETEs pass
    through ungated (a D for an indexed doc must reach the merge)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from pipelinewise_spark.cdc.pipeline import CdcPipeline
    from pipelinewise_spark.lake.table import LakeTable

    path = str(tmp_path / "mh")
    dedup_index.save_minhash_index(
        path, corpus, id_col="doc_id", text_col="text",
        num_hashes=16, bands=8, num_buckets=4)
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ])
    t = LakeTable.create(
        spark, str(tmp_path / "docs"), schema, ["doc_id"], num_buckets=2,
        properties={"soft_delete": True},
    )
    pipe = CdcPipeline(
        t, stream="docs",
        transform=dedup_index.gate_transform(path, min_est=0.5),
    )
    novel = "volcanic rock gardens bloom under the midnight aurora sky"
    batch = spark.createDataFrame(
        [(300, BASE + " once more", "I", 1),   # near-dup of indexed 1
         (301, novel, "I", 2),                 # novel -> admitted
         (302, None, "I", 3)],                 # unsignable -> admitted
        "doc_id long, text string, op string, lsn long",
    )
    m = pipe.apply_batch(batch, batch_id=0)
    got = {r["doc_id"] for r in t.read().collect()}
    assert got == {301, 302}, got
    assert m["inserted"] == 2
    # a DELETE for an admitted doc passes the gate untouched
    d = spark.createDataFrame(
        [(301, novel, "D", 10)],
        "doc_id long, text string, op string, lsn long",
    )
    pipe.apply_batch(d, batch_id=1)
    live = {r["doc_id"] for r in t.refresh().read().where(
        "_sdc_deleted_at IS NULL").collect()}
    assert live == {302}
