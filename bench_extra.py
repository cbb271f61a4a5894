#!/usr/bin/env python
"""Extra benchmarks for optimization work (guide §1.4 noop-sink isolation).

NOT part of the frozen driver contract (bench.py). Each row times one
operator in isolation against $SPARK_GRAFT_SF_DIR with the noop sink, so
the computation is measured without the sink. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [row ...]

With no args, runs every row once and prints a JSON dict of seconds.
`--plans DIR` additionally writes .explain("formatted") per row.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def rows(spark):
    """name -> zero-arg callable returning the DataFrame to time."""
    from pyspark.sql import functions as F

    from pipelinewise_spark.functions import ann, ann_index, dedup_index, dedup_text
    from pipelinewise_spark.queries import QUERIES

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    out = {}

    out["dedup_minhash_groups"] = lambda: dedup_text.minhash_signature_groups(
        docs, "doc_id", "text", num_hashes=16)
    out["ann_lsh_similar_pairs_p8"] = lambda: ann.lsh_similar_pairs(
        emb, dim=64, num_planes=8, threshold=0.3)
    out["ann_lsh_banded_pairs"] = lambda: ann.lsh_banded_pairs(
        emb, dim=64, bands=4, band_planes=10, threshold=0.3)
    out["ann_cosine_topk"] = lambda: QUERIES["ann_cosine_topk"](spark, SF_DIR)
    out["text_lang_id"] = lambda: QUERIES["text_lang_id"](spark, SF_DIR)
    out["text_quality_score"] = lambda: QUERIES["text_quality_score"](spark, SF_DIR)

    # persisted-minhash-index probe + gate, index built OUTSIDE the timing
    mh_dir = tempfile.mkdtemp(prefix="pw-mhidx-x-")
    dedup_index.save_minhash_index(
        mh_dir, docs.where(F.col("doc_id") % 50 != 0),
        id_col="doc_id", text_col="text",
        num_hashes=16, bands=4, num_buckets=16,
    )
    incoming = docs.where(F.col("doc_id") % 50 == 0)
    out["dedup_index_probe"] = lambda: dedup_index.minhash_lookup(
        spark, mh_dir, incoming, min_est=0.5)
    out["dedup_index_gate"] = lambda: dedup_index.dedup_gate(
        spark, mh_dir, incoming, min_est=0.5)

    idx_dir = tempfile.mkdtemp(prefix="pw-pqidx-x-")
    codes, cbs = ann_index.fit_pq_index(emb, m=4, sub_dim=16, k=8, iters=2)
    ann_index.save_pq_index(idx_dir, codes, cbs)
    model = ann_index.load_pq_index(spark, idx_dir)
    q8 = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), "embedding")
    out["ann_pq_adc_pretrained"] = lambda: ann.pq_adc_topk(
        emb, q8, m=4, sub_dim=16, k=8, top_k=10, model=model)
    return out


def cdc_rows(spark):
    """CDC-apply timings (same workload shape as bench.py, 1 run)."""
    import bench

    events_path = os.path.join(
        tempfile.gettempdir(),
        f"pw-bench-events-sf{bench.SF}-{bench.N_CONVS}x{bench.TURNS}+{bench.N_UPDATES}",
    )
    bench.generate_events(spark, events_path)
    return {
        "cdc_apply": lambda: bench.cdc_apply_bench(spark, events_path),
        "cdc_apply_mor": lambda: bench.cdc_apply_bench(
            spark, events_path, mode="mor"),
        "multistream6_seq": lambda: {"sec": bench.multistream_bench(
            spark, events_path)["concurrency_1"]},
    }


def main():
    from pipelinewise_spark.session import get_spark

    argv = sys.argv[1:]
    plans_dir = None
    if "--plans" in argv:
        i = argv.index("--plans")
        plans_dir = argv[i + 1]
        del argv[i:i + 2]
        os.makedirs(plans_dir, exist_ok=True)
    args = [a for a in argv if not a.startswith("--")]
    repeats = int(os.environ.get("PW_EXTRA_RUNS", "1"))
    spark = get_spark(app_name="pw-bench-extra", master=f"local[{CPUS}]")
    want_cdc = any(a.startswith(("cdc", "multistream")) for a in args)
    table = rows(spark)
    if want_cdc or not args:
        table.update(cdc_rows(spark))
    names = args or list(table)
    result = {}
    for name in names:
        fn = table[name]
        spark.sparkContext.setJobDescription(name)
        samples = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            r = fn()
            if r is not None and not isinstance(r, dict):
                _force(r)
            samples.append(round(time.perf_counter() - t0, 3))
        result[name] = samples if repeats > 1 else samples[0]
        if plans_dir is not None:
            r = fn()
            if r is not None and not isinstance(r, dict):
                with open(os.path.join(plans_dir, f"{name}.txt"), "w") as fh:
                    fh.write(r._sc._jvm.PythonSQLUtils.explainString(
                        r._jdf.queryExecution(), "formatted"))
        print(json.dumps({name: result[name]}), flush=True)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
