"""Round-5 hardening: a LIVE checkpointed change-feed consumer across a
schema-evolution boundary (VERDICT r4 #4), and persisted ANN indexes —
encode-once/query-many round-trips for PQ and IVF (VERDICT r4 #5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pipelinewise_spark.cdc.merge import merge_into
from pipelinewise_spark.evolution.drift import reconcile
from pipelinewise_spark.functions import ann, ann_index
from pipelinewise_spark.lake.stream_source import LakeTableStreamSource
from pipelinewise_spark.lake.table import LakeTable


def _drain(spark, path, ckpt, out_dir, schema, starting=None):
    """One availableNow run into a parquet sink; returns everything the
    sink has accumulated, read with the CURRENT (possibly evolved)
    schema — pre-evolution sink files lack added columns (NULL-filled)
    and carry narrower ints (widened natively on read)."""
    reader = spark.readStream.format("laketable").option("path", path)
    if starting is not None:
        reader = reader.option("startingVersion", starting)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    return spark.read.schema(schema).parquet(out_dir)


def test_feed_consumer_across_evolution_boundary(spark, tmp_path):
    """Evolve the table (add-column AND widen-promote) between two runs
    of the SAME checkpointed consumer: the pre-boundary run sees the
    narrow schema, the post-boundary resume picks up ONLY the new
    commits with the wide schema, and a fresh full replay reads the
    pre-boundary NARROW pages through the arrow cast + NULL-fill path
    (lake/stream_source.py read())."""
    spark.dataSource.register(LakeTableStreamSource)
    narrow = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("score", IntegerType()),
            StructField("text", StringType()),
        ]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "t"), narrow, ["conv_id"], num_buckets=2
    )
    b0 = spark.createDataFrame(
        [(i, "I", f"c{i}", i * 10, f"turn {i}") for i in range(8)],
        "lsn long, op string, conv_id string, score int, text string",
    )
    merge_into(t, b0, batch_id=0)

    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    got1 = _drain(spark, t.path, ck, out, t.read().schema, starting=0)
    assert got1.count() == 8
    assert dict(got1.dtypes)["score"] == "int"

    # --- evolution boundary: add `note` string, promote score int→long
    wide = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("score", LongType()),
            StructField("text", StringType()),
            StructField("note", StringType()),
        ]
    )
    actions = reconcile(t, wide, widen="promote")
    assert sorted(a["action"] for a in actions) == [
        "add_column",
        "promote_column",
    ]
    b1 = spark.createDataFrame(
        [
            (100 + i, "I", f"n{i}", (1 << 33) + i, f"new {i}", f"note {i}")
            for i in range(5)
        ],
        "lsn long, op string, conv_id string, score long, text string, "
        "note string",
    )
    t = t.refresh()
    merge_into(t, b1, batch_id=1)

    # --- SAME checkpoint resumes across the boundary: only the new
    # commit's files are read, with the evolved wide schema
    wide_read = t.read().schema
    got2 = _drain(spark, t.path, ck, out, wide_read, starting=0)
    new = got2.join(got1.select("conv_id", "_lsn"), ["conv_id"], "left_anti")
    assert {r["conv_id"] for r in new.select("conv_id").collect()} == {
        f"n{i}" for i in range(5)
    }
    post = {r["conv_id"]: r for r in new.collect()}
    assert post["n0"]["score"] == (1 << 33)  # value beyond int32 survives
    assert post["n3"]["note"] == "note 3"
    assert dict(got2.dtypes)["score"] == "bigint"

    # --- fresh full replay post-boundary: pre-promotion NARROW pages
    # (+ missing `note`) read through the cast/NULL-fill path
    replay = _drain(
        spark, t.path, str(tmp_path / "ck2"), str(tmp_path / "out2"),
        wide_read, starting=0,
    )
    old = {r["conv_id"]: r for r in replay.where(
        F.col("conv_id").startswith("c")).collect()}
    assert len(old) == 8
    assert old["c3"]["score"] == 30 and old["c3"]["note"] is None
    # folded latest state equals the live table (text equality per key);
    # CoW bucket re-emits are byte-identical copies at the same _lsn, so
    # the fold is max-LSN + distinct
    w = replay.groupBy("conv_id").agg(F.max("_lsn").alias("m"))
    latest = (
        replay.join(w, ["conv_id"])
        .where(F.col("_lsn") == F.col("m"))
        .dropDuplicates(["conv_id"])
    )
    live = t.read()
    cols = ["conv_id", "score", "text", "note"]
    lat = {tuple(r) for r in latest.select(*cols).collect()}
    liv = {tuple(r) for r in live.select(*cols).collect()}
    assert lat == liv and len(lat) == 13


def _emb(spark, n=64, dim=32, seed=7):
    import random

    rng = random.Random(seed)
    rows = [
        (i, [round(rng.uniform(-1, 1), 4) for _ in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_index_roundtrip_equals_inline(spark, tmp_path):
    """encode-once/query-many: save+load of a trained PQ index gives
    BIT-IDENTICAL ADC top-k to inline training."""
    emb = _emb(spark, n=80, dim=32).persist()
    queries = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    params = dict(m=4, sub_dim=8, k=4, iters=2)
    inline = ann.pq_adc_topk(
        emb, queries, top_k=5, **params
    ).collect()

    codes, codebooks = ann_index.fit_pq_index(emb, **params)
    idx = str(tmp_path / "pq")
    ann_index.save_pq_index(idx, codes, codebooks, params=params)
    model = ann_index.load_pq_index(spark, idx)
    # loaded codebooks round-trip exactly (int cells, float centroids)
    assert model[1] == codebooks
    loaded = ann.pq_adc_topk(
        emb, queries, top_k=5, model=model, **params
    ).collect()
    assert sorted(map(tuple, loaded)) == sorted(map(tuple, inline))
    emb.unpersist()


def test_ivf_index_roundtrip_equals_inline(spark, tmp_path):
    """Saved IVF centroids + cell assignments reproduce the inline
    ivf_topk result without recomputing cell means."""
    emb = _emb(spark, n=80, dim=16, seed=11).persist()
    queries = emb.where(F.col("vec_id") < 4)

    cells, centroids = ann_index.fit_ivf_index(emb, k=4, iters=2)
    labeled = emb.join(cells, "vec_id").withColumnRenamed("cell", "label")
    inline = ann.ivf_topk(labeled, queries, k=3, n_probe=2).collect()

    idx = str(tmp_path / "ivf")
    ann_index.save_ivf_index(idx, cells, centroids, params={"k": 4})
    l_cells, l_cents = ann_index.load_ivf_index(spark, idx)
    assert l_cents == centroids
    labeled2 = emb.join(l_cells, "vec_id").withColumnRenamed("cell", "label")
    loaded = ann.ivf_topk(
        labeled2, queries, k=3, n_probe=2, centroids=l_cents
    ).collect()
    assert sorted(map(tuple, loaded)) == sorted(map(tuple, inline))
    # and the pretrained path really skipped the centroid shuffle: its
    # plan contains no aggregate over the corpus for cell means
    plan = ann.ivf_topk(
        labeled2, queries, k=3, n_probe=2, centroids=l_cents
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "centroid_val" not in plan
    emb.unpersist()


def test_ivf_pretrained_rejects_wrong_kind(spark, tmp_path):
    emb = _emb(spark, n=20, dim=8)
    codes, codebooks = ann_index.fit_pq_index(
        emb, m=2, sub_dim=4, k=2, iters=1
    )
    idx = str(tmp_path / "pq2")
    ann_index.save_pq_index(idx, codes, codebooks)
    with pytest.raises(ValueError, match="kind"):
        ann_index.load_ivf_index(spark, idx)


def test_pq_adc_batch_equals_literal(spark, tmp_path):
    """The broadcast-LUT-join ADC variant (large query batches; the
    literal path builds an |Q|-branch expression tree) returns the SAME
    rows as the literal path on the same pre-trained model, and its
    codes-side join is broadcast (no shuffle of the codes table)."""
    emb = _emb(spark, n=100, dim=32, seed=3).persist()
    queries = emb.where(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    params = dict(m=4, sub_dim=8, k=4, iters=2)
    model = ann_index.fit_pq_index(emb, **params)
    lit_rows = ann.pq_adc_topk(
        emb, queries, top_k=5, model=model, **params
    ).collect()
    bat = ann.pq_adc_topk_batch(emb, queries, top_k=5, model=model, **params)
    assert sorted(map(tuple, bat.collect())) == sorted(map(tuple, lit_rows))
    plan = bat._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    emb.unpersist()


def test_warm_python_workers(spark):
    """Smoke: the pre-warm utility runs one tiny Arrow batch per core
    and returns; the timing evidence (7.0 s cold premium removed from a
    bounded run's first micro-batch) lives in BENCH.md round 5."""
    from pipelinewise_spark.session import warm_python_workers

    warm_python_workers(spark)


def test_pq_incremental_append_via_change_feed(spark, tmp_path):
    """Composed CDC × ANN story: an embeddings LakeTable is maintained
    by CDC merges; the persisted PQ index stays current by encoding
    ONLY the change-feed delta with the saved codebooks (no retrain, no
    re-encode of existing rows). ADC over the incrementally-maintained
    codes table equals ADC over a full re-encode with the same
    codebooks."""
    from pyspark.sql.types import ArrayType, DoubleType, LongType

    spark.dataSource.register(LakeTableStreamSource)
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "corpus"), schema, ["vec_id"], num_buckets=2
    )

    def as_events(df, lsn0):
        return df.select(
            (F.col("vec_id") + lsn0).alias("lsn"),
            F.lit("I").alias("op"),
            "vec_id",
            "embedding",
        )

    emb0 = _emb(spark, n=60, dim=16, seed=5)
    merge_into(t, as_events(emb0, 0), batch_id=0)
    v0 = t.refresh().version

    idx = str(tmp_path / "pq")
    params = dict(m=2, sub_dim=8, k=4, iters=2)
    codes, cbs = ann_index.fit_pq_index(
        t.read().select("vec_id", "embedding"), **params
    )
    ann_index.save_pq_index(idx, codes, cbs, params=params)

    # new vectors land via CDC (ids 1000+); the change feed from v0
    # carries them (plus CoW bucket re-emits of existing rows)
    emb1 = _emb(spark, n=15, dim=16, seed=9).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    merge_into(t, as_events(emb1, 5000), batch_id=1)

    feed = _drain(
        spark, t.path, str(tmp_path / "ck"), str(tmp_path / "out"),
        t.read().schema, starting=v0,
    )
    known, _ = ann_index.load_pq_index(spark, idx)
    delta = (
        feed.select("vec_id", "embedding")
        .dropDuplicates(["vec_id"])
        .join(known.select("vec_id"), "vec_id", "left_anti")
    )
    assert delta.count() == 15  # re-emitted old rows folded out
    ann_index.append_pq_codes(idx, delta)

    model_inc = ann_index.load_pq_index(spark, idx)
    assert model_inc[0].count() == 75
    full = ann.pq_encode(
        t.read().select("vec_id", "embedding"), cbs, sub_dim=8
    )
    queries = t.read().where(F.col("vec_id").isin(3, 1002)).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    got = ann.pq_adc_topk(
        t.read(), queries, top_k=5, model=model_inc, **params
    ).collect()
    want = ann.pq_adc_topk(
        t.read(), queries, top_k=5, model=(full, cbs), **params
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_pq_index_upsert_replaces_changed_vector(spark, tmp_path):
    """The codes store is a keyed LakeTable: an UPDATED embedding gets
    its code REPLACED on increment (a plain parquet append would leave
    both codes); unchanged rows keep their files (bucket-pruned CoW)."""
    emb = _emb(spark, n=40, dim=16, seed=21)
    params = dict(m=2, sub_dim=8, k=4, iters=2)
    codes, cbs = ann_index.fit_pq_index(emb, **params)
    idx = str(tmp_path / "pq")
    ann_index.save_pq_index(idx, codes, cbs, params=params)

    # vector 7 changes: shift it onto vector 30's position so its code
    # provably moves to 30's code word
    target = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    changed = spark.createDataFrame(
        [(7, target[30])], "vec_id long, embedding array<double>"
    )
    ann_index.append_pq_codes(idx, changed)

    loaded, _ = ann_index.load_pq_index(spark, idx)
    assert loaded.count() == 40  # replaced, not duplicated
    rows = {r["vec_id"]: (r["code0"], r["code1"]) for r in loaded.collect()}
    assert rows[7] == rows[30]


def test_ivf_incremental_assign(spark, tmp_path):
    """append_ivf_cells assigns new vectors to their nearest saved
    centroid and upserts; an updated vector is reassigned."""
    emb = _emb(spark, n=50, dim=16, seed=31)
    cells, centroids = ann_index.fit_ivf_index(emb, k=4, iters=2)
    idx = str(tmp_path / "ivf")
    ann_index.save_ivf_index(idx, cells, centroids)

    # 10 new vectors land
    new = _emb(spark, n=10, dim=16, seed=99).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    ann_index.append_ivf_cells(idx, new)
    l_cells, l_cents = ann_index.load_ivf_index(spark, idx)
    assert l_cells.count() == 60
    # each new vector sits in its argmin cell vs the saved centroids
    import math

    cent = dict(l_cents)
    got = {r["vec_id"]: r["cell"] for r in l_cells.where(
        F.col("vec_id") >= 1000).collect()}
    for r in new.collect():
        v = r["embedding"]
        best = min(
            sorted(cent),
            key=lambda c: (
                round(sum((a - b) ** 2 for a, b in zip(v, cent[c])), 6), c),
        )
        assert got[r["vec_id"]] == best
    # move an existing vector exactly onto a centroid: reassignment
    c0 = min(sorted(cent))
    moved = spark.createDataFrame(
        [(3, [float(x) for x in cent[c0]])],
        "vec_id long, embedding array<double>",
    )
    ann_index.append_ivf_cells(idx, moved)
    l2, _ = ann_index.load_ivf_index(spark, idx)
    assert l2.count() == 60
    assert l2.where(F.col("vec_id") == 3).collect()[0]["cell"] == c0


def test_index_guards_and_geometry(spark, tmp_path):
    """Review fixes: (a) a pre-trained model's geometry is DERIVED from
    its codebooks, so wrong keyword params cannot poison scoring; (b) a
    duplicate-id delta is rejected loudly; (c) re-saving a retrained
    index with different geometry recreates the codes table instead of
    silently dropping columns."""
    emb = _emb(spark, n=40, dim=16, seed=41)
    idx = str(tmp_path / "pq")
    codes, cbs = ann_index.fit_pq_index(emb, m=2, sub_dim=8, k=4, iters=2)
    ann_index.save_pq_index(idx, codes, cbs)
    model = ann_index.load_pq_index(spark, idx)
    qs = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    # (a) defaults say m=4/sub_dim=16; the model says m=2/sub_dim=8 —
    # both calls must return the model's (correct) answer
    right = ann.pq_adc_topk(
        emb, qs, m=2, sub_dim=8, k=4, top_k=5, model=model
    ).collect()
    derived = ann.pq_adc_topk(emb, qs, top_k=5, model=model).collect()
    derived_b = ann.pq_adc_topk_batch(emb, qs, top_k=5, model=model).collect()
    assert sorted(map(tuple, derived)) == sorted(map(tuple, right))
    assert sorted(map(tuple, derived_b)) == sorted(map(tuple, right))

    # (b) duplicate ids in the delta → loud error, not a stale code
    dup = emb.where(F.col("vec_id").isin(5)).unionAll(
        emb.where(F.col("vec_id").isin(5))
    )
    with pytest.raises(ValueError, match="duplicate"):
        ann_index.append_pq_codes(idx, dup)

    # (c) retrain with m=4 and re-save to the SAME path: the codes
    # table is recreated with 4 code columns and loads cleanly
    codes4, cbs4 = ann_index.fit_pq_index(emb, m=4, sub_dim=4, k=4, iters=2)
    ann_index.save_pq_index(idx, codes4, cbs4)
    loaded, lcbs = ann_index.load_pq_index(spark, idx)
    assert len(lcbs) == 4 and set(loaded.columns) >= {"code0", "code3"}
    assert loaded.count() == 40


def test_round6_matches_spark_round(spark):
    """Driver-side LUT rounding must equal Spark's F.round HALF_UP on
    half-boundary values (Python's round() is half-even and diverges)."""
    from pipelinewise_spark.functions.ann import _round6

    vals = [5e-7, 1.5e-6, 2.5e-6, 0.1234565, 1.0000005, 0.0, 3.2e-6]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r[0] for r in df.select(F.round("x", 6)).collect()]
    assert [_round6(v) for v in vals] == got
    assert _round6(float("inf")) == float("inf")
