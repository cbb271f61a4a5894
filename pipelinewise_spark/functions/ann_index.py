"""Persisted ANN indexes: train ONCE, save beside the lake, query MANY.

The production shape for ANN at 10⁹+ vectors is encode-once/query-many:
training (k-means codebooks, PQ subspace codebooks) and corpus encoding
are batch jobs that run when the corpus changes; query jobs load the
trained model and score without touching raw vectors. An index here is
two artifacts:

- ``index.json`` — the small driver-side model (PQ codebooks / IVF
  centroids + the training params), k·dim doubles total, embedded as
  broadcast literals at query time;
- ``codes/`` — the corpus-sized encoded table (PQ code words / IVF cell
  assignments), stored as a KEYED LakeTable (key = the vector id):
  every save/increment is an atomic manifest commit (a crashed
  maintenance job leaves the previous snapshot readable, never partial
  files), and increments are CoW UPSERTS — a vector whose embedding
  CHANGED gets its code REPLACED, where a plain parquet append would
  leave both codes in the index.

Layout::

    <path>/index.json
    <path>/codes/            (LakeTable: _manifests/ + data/)

Loaded PQ indexes plug straight into
:func:`pipelinewise_spark.functions.ann.pq_adc_topk` via ``model=``;
loaded IVF indexes into :func:`...ann.ivf_topk` via ``centroids=`` plus
a join of the saved cell assignments onto the corpus. Round-trip
equality with inline training is asserted in
``tests/test_round5_features.py``.

Maintenance jobs are assumed single-writer per index (the usual shape:
one scheduled encode job per corpus table); concurrent increments are
serialized by the LakeTable's optimistic commit.

Reference parity: PipelineWise has no ANN surface; this is part of the
training-data-pipeline extension (SURVEY.md §2, LLM-data ops).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipelinewise_spark.functions import ann

_INDEX_JSON = "index.json"
_CODES_DIR = "codes"


def _try_doc(path: str) -> dict | None:
    try:
        with open(os.path.join(path, _INDEX_JSON)) as fh:
            return json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def _doc_codes_path(path: str, doc: dict) -> str:
    return os.path.join(path, doc.get("codes_dir", _CODES_DIR))


def _save_codes(
    path: str,
    df: DataFrame,
    id_col: str,
    num_buckets: int,
    *,
    key_cols: list[str] | None = None,
    bucket_col: str | None = None,
) -> str:
    """Materialize the encoded table as a LakeTable keyed on the vector
    id (or ``key_cols``, e.g. the dedup index's ``(id, band)`` with
    ``bucket_col=id`` so per-document ops stay bucket-pruned); returns
    the codes DIR NAME to record in ``index.json``.

    EVERY save writes a fresh versioned dir (``codes``, ``codes-2``,
    ...): a retrained index's codebooks ~always differ, so an in-place
    overwrite of the current table would open a crash window pairing
    the NEW codes with the OLD codebooks — and a full overwrite
    rewrites every bucket anyway, so versioning the dir costs nothing.
    The old table stays untouched until ``index.json`` — the index's
    single commit point — atomically flips to the new dir; the caller
    removes superseded/orphaned dirs after the flip. (Incremental
    updates go through :func:`_upsert_codes`, which IS atomic in place
    via the table's own manifest commit.)"""
    from pipelinewise_spark.lake.table import LakeTable

    n = 0
    for d in os.listdir(path) if os.path.isdir(path) else []:
        if d == _CODES_DIR:
            n = max(n, 1)
        elif d.startswith(_CODES_DIR + "-"):
            try:
                n = max(n, int(d.rsplit("-", 1)[1]))
            except ValueError:
                pass
    new_dir = _CODES_DIR if n == 0 else f"{_CODES_DIR}-{n + 1}"
    LakeTable.create(
        df.sparkSession, os.path.join(path, new_dir), df.schema,
        key_cols or [id_col], num_buckets=num_buckets,
        bucket_col=bucket_col,
    ).overwrite(df)
    return new_dir


def _cleanup_codes_dirs(path: str, keep: set[str]) -> None:
    """Remove superseded/orphaned codes dirs (anything not in ``keep``)
    — best-effort, AFTER the index.json flip.

    Re-saves keep the immediately-superseded snapshot as a READER GRACE
    period: a long-running query job that loaded the index before the
    re-save holds a lazy DataFrame over the old dir's files; deleting
    them mid-query would fail it. One prior snapshot survives until the
    NEXT re-save (or an explicit :func:`vacuum_index`), so readers only
    need to re-load once per re-save cycle — the same one-version
    guarantee the LakeTable's own vacuum gives its readers."""
    import shutil

    for d in os.listdir(path):
        if d not in keep and (
            d == _CODES_DIR or d.startswith(_CODES_DIR + "-")
        ):
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)


def vacuum_index(path: str) -> None:
    """Drop every codes snapshot except the CURRENT one (including the
    grace-period dir a re-save leaves for in-flight readers). Run it
    when no query job older than the last re-save can still be alive."""
    doc = _try_doc(path)
    if doc is None:
        return
    _cleanup_codes_dirs(path, {doc.get("codes_dir", _CODES_DIR)})


def _check_one_per_id(df: DataFrame, id_col: str, *extra_aggs) -> tuple:
    """Enforce the increment contract: ONE row per id. A change-feed
    micro-batch routinely holds several versions of the same id (two
    updates in a window, CoW bucket re-emits), and only the CALLER
    knows which is latest (it has the feed's ``_lsn``); folding here
    would pick one arbitrarily and could persist a stale row, so
    duplicates are REJECTED loudly. Returns ``(total, distinct,
    *extra_aggs results)`` from ONE aggregate pass so callers can ride
    extra counters on the same scan."""
    res = df.agg(
        F.count(id_col), F.count_distinct(F.col(id_col)), *extra_aggs
    ).first()
    total, distinct = res[0], res[1]
    if total and total != distinct:
        raise ValueError(
            f"index increment carries {total - distinct} duplicate "
            f"{id_col} row(s); fold the delta to one row per id first "
            f"(last-per-key by the feed's _lsn)"
        )
    return tuple(res)


def _merge_rows(path: str, doc: dict, src: DataFrame, op: str) -> None:
    """THE commit ritual every index mutation (PQ/IVF/minhash, insert
    or delete) goes through: stamp the synthetic LSN and run the
    bucket-pruned merge.

    The synthetic LSN is the target's next manifest version, so a
    replay can never REGRESS a row; increments deliberately avoid the
    bounded applied-batch-id ring (an index sees unbounded increments —
    exhausting the 1024-entry window would brick maintenance). Note
    what that does NOT give: a retried call re-applies its delta as a
    fresh commit — harmless when the delta is identical (same-content
    replace), but a retry that re-derives a DIFFERENT delta is a second
    logical update, not a detected replay. Streaming callers get true
    exactly-once from their checkpoint, not from this LSN."""
    from pipelinewise_spark.cdc.merge import merge_into
    from pipelinewise_spark.lake.table import LakeTable

    t = LakeTable(src.sparkSession, _doc_codes_path(path, doc))
    src = src.withColumn(
        "lsn", F.lit(int(t.version) + 1).cast("long")
    ).withColumn("op", F.lit(op))
    merge_into(t, src, stream="index")


def _upsert_codes(path: str, doc: dict, df: DataFrame, id_col: str):
    """CoW-upsert encoded rows: new ids insert, changed ids replace.
    An EMPTY delta is a no-op (no commit). Returns the applied row
    count (0 for the no-op) so callers can gate drift bookkeeping.
    One row per id enforced (:func:`_check_one_per_id`); commit and
    replay semantics in :func:`_merge_rows`."""
    total = _check_one_per_id(df, id_col)[0]
    if total == 0:
        return 0
    _merge_rows(path, doc, df, "I")
    return int(total)


def _read_codes(
    spark: SparkSession, path: str, doc: dict, cols: list[str]
) -> DataFrame:
    from pipelinewise_spark.lake.table import LakeTable

    return LakeTable(spark, _doc_codes_path(path, doc)).read().select(*cols)


def _write_doc(path: str, doc: dict) -> None:
    """THE commit protocol for ``index.json`` (every save/update goes
    through here): write to a tmp file, atomic ``os.replace``."""
    tmp = os.path.join(path, _INDEX_JSON + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    os.replace(tmp, os.path.join(path, _INDEX_JSON))


def _update_doc(path: str, **fields) -> None:
    """Atomically fold metadata fields (drift stats, feed watermark)
    into ``index.json``. Single-writer per index (module contract), so
    read-modify-replace is safe; the replace is atomic either way."""
    doc = _load_doc_any(path)
    doc.update(fields)
    _write_doc(path, doc)


def _record_delta_stats(path: str, err: float, rows: int) -> None:
    """Drift bookkeeping after an increment: the LAST delta's error (the
    operator-visible number) plus a CUMULATIVE rows-weighted sum since
    the last fit/retrain — a drain of many micro-batches must not let
    its final in-distribution batch erase the drifted ones before it
    (:func:`needs_retrain` reads the weighted mean)."""
    doc = _load_doc_any(path)
    doc["last_delta_error"] = err
    doc["last_delta_rows"] = rows
    doc["delta_error_sum"] = doc.get("delta_error_sum", 0.0) + err * rows
    doc["delta_rows_sum"] = doc.get("delta_rows_sum", 0) + rows
    _write_doc(path, doc)


def _min_d2(sub, centroid_vecs) -> "F.Column":
    """min over centroids of ||sub - c||² (expansion form, clamped at 0
    against FP cancellation) — the quantization error of one subspace."""
    s_dot = ann.dot(sub, sub)
    opts = []
    for cv in centroid_vecs:
        arr = F.array(*[F.lit(float(x)) for x in cv])
        cc = float(sum(x * x for x in cv))
        opts.append(s_dot + F.lit(cc) - 2.0 * ann.dot(sub, arr))
    best = opts[0] if len(opts) == 1 else F.least(*opts)
    return F.greatest(best, F.lit(0.0))


def _pq_mse(df: DataFrame, codebooks: list[dict], vec_col: str) -> float:
    """Mean PQ quantization error of ``df`` under ``codebooks``:
    avg over rows of Σ_j min_c ||sub_j − centroid_{j,c}||². One scan,
    pure-JVM expressions — cheap enough to run on every fit AND every
    increment delta (the drift probe's whole point)."""
    sub_dim = len(next(iter(codebooks[0].values())))
    base = df.select(F.col(vec_col).cast("array<double>").alias("v"))
    total = None
    for j, cb in enumerate(codebooks):
        sub = F.slice(F.col("v"), j * sub_dim + 1, sub_dim)
        term = _min_d2(sub, [cb[c] for c in sorted(cb)])
        total = term if total is None else total + term
    val = base.agg(F.avg(total)).first()[0]
    return float(val) if val is not None else 0.0


def _ivf_mse(
    df: DataFrame, centroids: list[tuple[int, list[float]]], vec_col: str
) -> float:
    """Mean distance-to-nearest-centroid — the IVF drift probe."""
    base = df.select(F.col(vec_col).cast("array<double>").alias("v"))
    term = _min_d2(F.col("v"), [v for _, v in centroids])
    val = base.agg(F.avg(term)).first()[0]
    return float(val) if val is not None else 0.0


def retrain_index(
    spark: SparkSession,
    path: str,
    corpus_df: DataFrame,
    *,
    vec_col: str = "embedding",
) -> None:
    """Refit the index in place from the CURRENT corpus — the action
    :func:`needs_retrain` calls for. Geometry (m/sub_dim/k) is derived
    from the saved model so the retrained index answers the same
    queries; ``iters`` comes from the saved params (default 2). The
    re-save goes through the normal commit point (old snapshot kept as
    the reader grace dir) and CARRIES THE FEED WATERMARK FORWARD: the
    refit corpus already contains everything the feed delivered, so a
    feed-driven maintainer (jobs/run_feed.py --retrain-on-drift)
    resumes incrementing where it left off instead of re-absorbing
    re-emits."""
    from pipelinewise_spark.lake.table import LakeTable

    doc = _load_doc_any(path)
    saved_params = doc.get("params") or {}
    iters = int(saved_params.get("iters", 2))
    buckets = LakeTable(spark, _doc_codes_path(path, doc)).num_buckets
    wm = doc.get("feed_lsn_watermark")
    # the watermark rides INSIDE the save's commit-point write: a crash
    # anywhere leaves either the old doc (old watermark) or the new doc
    # (watermark carried) — never a retrained index that forgot it
    extra = {"feed_lsn_watermark": int(wm)} if wm is not None else None
    base = corpus_df.select(F.col(doc["id_col"]), F.col(vec_col))
    if doc["kind"] == "pq":
        codebooks = [
            {int(c): [float(x) for x in v] for c, v in cb.items()}
            for cb in doc["codebooks"]
        ]
        m, sub_dim = len(codebooks), len(next(iter(codebooks[0].values())))
        k = int(saved_params.get("k", max(len(cb) for cb in codebooks)))
        codes, cbs = fit_pq_index(
            base, id_col=doc["id_col"], vec_col=vec_col, m=m,
            sub_dim=sub_dim, k=k, iters=iters,
        )
        save_pq_index(
            path, codes, cbs, id_col=doc["id_col"], num_buckets=buckets,
            params=saved_params, fit_df=base, vec_col=vec_col,
            extra_fields=extra,
        )
    else:
        # prefer the TRAINED k from params: the saved centroid list only
        # holds non-empty cells, so deriving k from its length would
        # shrink the quantizer monotonically across retrains
        k = int(saved_params.get("k", len(doc["centroids"])))
        cells, cents = fit_ivf_index(
            base, id_col=doc["id_col"], vec_col=vec_col, k=k, iters=iters,
        )
        save_ivf_index(
            path, cells, cents, id_col=doc["id_col"], num_buckets=buckets,
            params=saved_params, fit_df=base, vec_col=vec_col,
            extra_fields=extra,
        )


def needs_retrain(
    path: str, factor: float = 2.0, min_rows: int = 1
) -> bool:
    """Increments never retrain the codebooks/centroids — this probe
    says when a retrain IS warranted: the rows-weighted mean
    quantization error of ALL deltas since the last fit (accumulated by
    ``append_*`` into ``index.json``; the weighted mean so a drain's
    final in-distribution micro-batch cannot erase the drifted batches
    before it) exceeds ``factor`` × the error measured over the fit
    corpus at save time. Drifted data quantizes badly against stale
    codebooks, so rising delta error is exactly the signal; a fresh
    fit+save resets the stats. ``min_rows`` guards against a single
    noisy vector triggering a full-corpus retrain — set it to a few
    thousand in production (default 1 keeps small test fixtures
    sensitive). Returns False when the baseline or stats are missing
    (old index, or saved without ``fit_df``). Reference analog: the
    resync-size guard that flips PipelineWise from incremental to full
    resync (pipelinewise/utils.py get_tables_size usage)."""
    doc = _load_doc_any(path)
    fit_err = doc.get("fit_error")
    n = doc.get("delta_rows_sum", 0)
    if fit_err is None or n < max(min_rows, 1):
        return False
    delta_err = doc["delta_error_sum"] / n
    if fit_err <= 0.0:
        return delta_err > 0.0
    return delta_err > factor * fit_err


def fit_pq_index(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    sub_dim: int = 16,
    k: int = 8,
    iters: int = 2,
) -> tuple[DataFrame, list[dict]]:
    """Train PQ codebooks and encode the corpus — the public handle on
    :func:`ann._pq_fit`; the returned ``(codes_df, codebooks)`` tuple is
    exactly what :func:`ann.pq_adc_topk` accepts as ``model=``."""
    return ann._pq_fit(
        df, id_col=id_col, vec_col=vec_col, m=m, sub_dim=sub_dim, k=k,
        iters=iters,
    )


def save_pq_index(
    path: str,
    codes: DataFrame,
    codebooks: list[dict],
    *,
    id_col: str = "vec_id",
    num_buckets: int = 16,
    params: dict | None = None,
    fit_df: DataFrame | None = None,
    vec_col: str = "embedding",
    extra_fields: dict | None = None,
) -> None:
    """Persist a trained PQ index: codebooks (m dicts of cell→centroid,
    a few KB) to ``index.json``, the encoded corpus to the ``codes/``
    LakeTable. The ``index.json`` replace is the COMMIT POINT: a crash
    anywhere before it leaves the previous (codebooks, codes) pair
    intact and consistent (see :func:`_save_codes`). The codes write is
    the only distributed job — one scan of the already-encoded
    DataFrame plus the keyed bucket write.

    Pass ``fit_df`` (the corpus the codebooks were trained on) to record
    its mean quantization error as the :func:`needs_retrain` drift
    baseline — one extra scan. A re-save resets the drift stats.
    ``extra_fields`` are folded into the doc BEFORE the commit-point
    replace (so e.g. :func:`retrain_index` carries the feed watermark
    atomically with the new model, no crash window)."""
    os.makedirs(path, exist_ok=True)
    old = _try_doc(path)
    codes_dir = _save_codes(path, codes, id_col, num_buckets)
    doc = {
        "kind": "pq",
        "id_col": id_col,
        "codes_dir": codes_dir,
        "params": params or {},
        "codebooks": [
            {str(c): list(v) for c, v in cb.items()} for cb in codebooks
        ],
    }
    if fit_df is not None:
        doc["fit_error"] = _pq_mse(fit_df, codebooks, vec_col)
    doc.update(extra_fields or {})
    _write_doc(path, doc)
    keep = {codes_dir}
    if old is not None:  # reader grace: see _cleanup_codes_dirs
        keep.add(old.get("codes_dir", _CODES_DIR))
    _cleanup_codes_dirs(path, keep)


def load_pq_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, list[dict]]:
    """Load a saved PQ index as the ``(codes_df, codebooks)`` tuple
    :func:`ann.pq_adc_topk` takes via ``model=`` — ADC scoring then
    scans ONLY the codes table; raw vectors are never read."""
    doc = _load_doc(path, "pq")
    codebooks = [
        {int(c): [float(x) for x in v] for c, v in cb.items()}
        for cb in doc["codebooks"]
    ]
    cols = [doc["id_col"]] + [f"code{j}" for j in range(len(codebooks))]
    return _read_codes(spark, path, doc, cols), codebooks


def append_pq_codes(
    path: str,
    new_df: DataFrame,
    *,
    vec_col: str = "embedding",
) -> None:
    """INCREMENTAL index maintenance: encode ``new_df`` (rows newly
    landed or changed in the corpus, e.g. a CDC batch or a change-feed
    micro-batch) against the index's SAVED codebooks and UPSERT into
    the codes LakeTable — new ids insert, changed ids replace their old
    code (a bucket-pruned CoW merge touching only affected buckets).
    No training, no re-encode of unchanged rows — one projection over
    the delta (sub_dim is recovered from the stored centroid length).
    At 10⁹ vectors this is the difference between re-encoding the world
    per corpus update and encoding just the delta; retrain+rebuild only
    when codebook drift warrants it."""
    doc = _load_doc(path, "pq")
    codebooks = [
        {int(c): [float(x) for x in v] for c, v in cb.items()}
        for cb in doc["codebooks"]
    ]
    sub_dim = len(next(iter(codebooks[0].values())))
    codes = ann.pq_encode(
        new_df, codebooks, id_col=doc["id_col"], vec_col=vec_col,
        sub_dim=sub_dim,
    )
    applied = _upsert_codes(path, doc, codes, doc["id_col"])
    if applied:
        # drift probe: how badly does the DELTA quantize against the
        # saved (never-retrained) codebooks — see needs_retrain
        _record_delta_stats(path, _pq_mse(new_df, codebooks, vec_col),
                            applied)


def _delete_rows(
    path: str,
    doc: dict,
    keys_df: DataFrame,
    *,
    key_cols: list[str] | None = None,
) -> None:
    """Shared removal path: bucket-pruned merge with D ops keyed on
    ``key_cols`` (default: the index's id column; the minhash index
    passes its composite ``(id, band)``); the non-key columns ride
    along as NULL before-images typed from the table's own manifest
    (delete matches on the key)."""
    from pipelinewise_spark.lake.table import (
        METADATA_COLS, LakeTable, _struct_from_fields,
    )

    key_cols = key_cols or [doc["id_col"]]
    t = LakeTable(keys_df.sparkSession, _doc_codes_path(path, doc))
    src = keys_df.select(*key_cols).distinct()
    for f in t.manifest["fields"]:
        if f["logical"] not in key_cols and f["logical"] not in METADATA_COLS:
            # manifest types for complex columns (e.g. the minhash
            # index's array<string> slices) are JSON dicts, not DDL
            # strings — go through the manifest's own type parser
            dt = _struct_from_fields([(f["logical"], f["type"])])[0].dataType
            src = src.withColumn(f["logical"], F.lit(None).cast(dt))
    _merge_rows(path, doc, src, "D")


def delete_pq_codes(path: str, ids_df: DataFrame) -> None:
    """Remove DELETED corpus vectors from the index: a change-feed
    tombstone (or any deleted-ids set) must take its code OUT of the
    codes table, or ADC keeps returning the dead document forever.
    ``ids_df`` carries just the id column; the removal is the same
    bucket-pruned merge with D ops (code columns as NULL before-images
    — delete matches on the key alone)."""
    _delete_rows(path, _load_doc(path, "pq"), ids_df)


def fit_ivf_index(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Train the IVF coarse quantizer (deterministic Lloyd k-means,
    :func:`ann._kmeans_fit`) and assign every corpus vector to its cell.
    Returns ``(cells_df(id_col, cell), centroids)`` where centroids are
    the POST-assignment per-cell means (round-6, exactly what
    :func:`ann.label_centroids` computes inline over the assigned
    corpus) — so ``ivf_topk(..., centroids=saved)`` is bit-equal to the
    inline path."""
    assigned, _ = ann._kmeans_fit(
        df, id_col=id_col, vec_col=vec_col, k=k, iters=iters
    )
    rows = (
        ann.label_centroids(
            assigned.withColumnRenamed("cell", "label"),
            label_col="label",
            vec_col="v",
        )
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("idx", "centroid_val"))
            ).alias("s")
        )
        .select("label", F.transform("s", lambda x: x["centroid_val"]).alias("cv"))
        .collect()
    )
    centroids = sorted(
        (int(r["label"]), [float(x) for x in r["cv"]]) for r in rows
    )
    return assigned.select(assigned["id"].alias(id_col), "cell"), centroids


def save_ivf_index(
    path: str,
    cells: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    id_col: str = "vec_id",
    num_buckets: int = 16,
    params: dict | None = None,
    fit_df: DataFrame | None = None,
    vec_col: str = "embedding",
    extra_fields: dict | None = None,
) -> None:
    """Persist an IVF index: centroids (k·dim doubles) to
    ``index.json``, cell assignments to the ``codes/`` LakeTable.
    ``index.json`` is the commit point, as in :func:`save_pq_index`;
    ``fit_df`` records the :func:`needs_retrain` drift baseline and
    ``extra_fields`` land atomically with the commit."""
    os.makedirs(path, exist_ok=True)
    old = _try_doc(path)
    codes_dir = _save_codes(path, cells, id_col, num_buckets)
    doc = {
        "kind": "ivf",
        "id_col": id_col,
        "codes_dir": codes_dir,
        "params": params or {},
        "centroids": [[int(c), list(v)] for c, v in centroids],
    }
    if fit_df is not None:
        doc["fit_error"] = _ivf_mse(
            fit_df, [(c, v) for c, v in centroids], vec_col
        )
    doc.update(extra_fields or {})
    _write_doc(path, doc)
    keep = {codes_dir}
    if old is not None:  # reader grace: see _cleanup_codes_dirs
        keep.add(old.get("codes_dir", _CODES_DIR))
    _cleanup_codes_dirs(path, keep)


def load_ivf_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Load a saved IVF index: ``(cells_df, centroids)``. Query with
    ``ann.ivf_topk(corpus.join(cells_df, id_col), queries,
    label_col="cell", centroids=centroids)`` — the centroid recompute
    (a corpus-wide shuffle) is skipped; only the pruned candidate cells
    are scanned."""
    doc = _load_doc(path, "ivf")
    centroids = [
        (int(c), [float(x) for x in v]) for c, v in doc["centroids"]
    ]
    cells = _read_codes(spark, path, doc, [doc["id_col"], "cell"])
    return cells, centroids


def append_ivf_cells(
    path: str,
    new_df: DataFrame,
    *,
    vec_col: str = "embedding",
) -> None:
    """INCREMENTAL IVF maintenance: assign new/changed corpus vectors
    to their nearest SAVED centroid (broadcast-literal argmin, the same
    rounded-d2/tie-on-cell expression shape the trainer uses) and
    upsert into the cells LakeTable. The coarse quantizer is not
    retrained; the saved centroids are the post-fit cell means, so
    increments land in the cell a probe against those means would
    search — cells are a pruning partition, and a periodic re-fit
    absorbs long-term drift."""
    doc = _load_doc(path, "ivf")
    id_col = doc["id_col"]
    centroids = [
        (int(c), [float(x) for x in v]) for c, v in doc["centroids"]
    ]
    base = new_df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    v_dot = ann.dot(F.col("v"), F.col("v"))
    opts = []
    for cell_id, cv in centroids:
        arr = F.array(*[F.lit(float(x)) for x in cv])
        cc = float(sum(x * x for x in cv))
        d2 = F.round(v_dot + F.lit(cc) - 2.0 * ann.dot(F.col("v"), arr), 6)
        opts.append(F.struct(d2.alias("d"), F.lit(cell_id).alias("c")))
    assigned = base.select(
        F.col(id_col), F.array_min(F.array(*opts))["c"].alias("cell")
    )
    applied = _upsert_codes(path, doc, assigned, id_col)
    if applied:
        _record_delta_stats(path, _ivf_mse(new_df, centroids, vec_col),
                            applied)


def delete_ivf_cells(path: str, ids_df: DataFrame) -> None:
    """IVF twin of :func:`delete_pq_codes`: take tombstoned vectors'
    cell rows OUT of the cells LakeTable. ``ivf_topk`` inner-joins the
    cells onto the live corpus, so stale rows never produce wrong
    answers — but left in place they accumulate without bound (dead-id
    garbage grows with total churn, not live corpus size) and every
    probe scans them; symmetric maintenance keeps the index
    O(live corpus)."""
    _delete_rows(path, _load_doc(path, "ivf"), ids_df)


def _load_doc(path: str, kind: str) -> dict:
    doc = _load_doc_any(path)
    if doc.get("kind") != kind:
        raise ValueError(
            f"index at {path} is kind={doc.get('kind')!r}, expected {kind!r}"
        )
    return doc


def _load_doc_any(path: str) -> dict:
    with open(os.path.join(path, _INDEX_JSON)) as fh:
        return json.load(fh)


def index_kind(path: str) -> str:
    """``"pq"``, ``"ivf"``, or ``"minhash"`` (the persisted dedup
    index, :mod:`.dedup_index`) — lets a consumer (jobs/run_feed.py
    ``--index-kind auto``) dispatch maintenance without being told."""
    return _load_doc_any(path)["kind"]


def feed_watermark(path: str) -> int:
    """Highest change-feed ``_lsn`` this index has absorbed (-1 before
    the first increment). A CoW bucket rewrite RE-EMITS every row of
    the bucket into the change feed, but re-emitted rows keep their
    ORIGINAL per-row ``_lsn`` — so filtering a micro-batch to
    ``_lsn > feed_watermark(path)`` drops exactly the unchanged
    re-emits and keeps exactly the true inserts/updates/deletes. Without
    it, one changed vector re-encodes and re-merges its whole bucket
    per batch (correct, but O(bucket) instead of O(delta) work)."""
    return int(_load_doc_any(path).get("feed_lsn_watermark", -1))


def set_feed_watermark(path: str, lsn: int) -> None:
    """Record the watermark AFTER the increment lands. Crash between
    the upsert and this write just re-applies the same delta next run
    (same-content replace — idempotent); the streaming checkpoint is
    what guarantees the batch itself is not lost."""
    _update_doc(path, feed_lsn_watermark=int(lsn))
