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
  assignments) as parquet, partition-friendly and re-usable across
  query jobs.

Layout::

    <path>/index.json
    <path>/codes/part-*.parquet

Loaded PQ indexes plug straight into
:func:`pipelinewise_spark.functions.ann.pq_adc_topk` via ``model=``;
loaded IVF indexes into :func:`...ann.ivf_topk` via ``centroids=`` plus
a join of the saved cell assignments onto the corpus. Round-trip
equality with inline training is asserted in
``tests/test_round5_features.py``.

Reference parity: PipelineWise has no ANN surface; this is part of the
training-data-pipeline extension (SURVEY.md §2, LLM-data ops).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from pipelinewise_spark.functions import ann

_INDEX_JSON = "index.json"
_CODES_DIR = "codes"


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
    params: dict | None = None,
) -> None:
    """Persist a trained PQ index: codebooks (m dicts of cell→centroid,
    a few KB) to ``index.json``, the encoded corpus to ``codes/``
    parquet. The codes write is the only distributed job — one scan of
    the already-encoded DataFrame, no shuffle."""
    os.makedirs(path, exist_ok=True)
    codes.write.mode("overwrite").parquet(os.path.join(path, _CODES_DIR))
    doc = {
        "kind": "pq",
        "id_col": id_col,
        "params": params or {},
        "codebooks": [
            {str(c): list(v) for c, v in cb.items()} for cb in codebooks
        ],
    }
    tmp = os.path.join(path, _INDEX_JSON + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    os.replace(tmp, os.path.join(path, _INDEX_JSON))


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
    codes = spark.read.parquet(os.path.join(path, _CODES_DIR))
    return codes, codebooks


def append_pq_codes(
    path: str,
    new_df: DataFrame,
    *,
    vec_col: str = "embedding",
) -> None:
    """INCREMENTAL index maintenance: encode ``new_df`` (rows newly
    landed in the corpus, e.g. a CDC batch or a change-feed micro-batch)
    against the index's SAVED codebooks and append to the codes table.
    No training, no touch of existing codes — one projection over the
    new rows (sub_dim is recovered from the stored centroid length).
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
    codes.write.mode("append").parquet(os.path.join(path, _CODES_DIR))


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
    from pyspark.sql import functions as F

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
    params: dict | None = None,
) -> None:
    """Persist an IVF index: centroids (k·dim doubles) to
    ``index.json``, cell assignments to ``codes/`` parquet."""
    os.makedirs(path, exist_ok=True)
    cells.write.mode("overwrite").parquet(os.path.join(path, _CODES_DIR))
    doc = {
        "kind": "ivf",
        "id_col": id_col,
        "params": params or {},
        "centroids": [[int(c), list(v)] for c, v in centroids],
    }
    tmp = os.path.join(path, _INDEX_JSON + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    os.replace(tmp, os.path.join(path, _INDEX_JSON))


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
    cells = spark.read.parquet(os.path.join(path, _CODES_DIR))
    return cells, centroids


def _load_doc(path: str, kind: str) -> dict:
    with open(os.path.join(path, _INDEX_JSON)) as fh:
        doc = json.load(fh)
    if doc.get("kind") != kind:
        raise ValueError(
            f"index at {path} is kind={doc.get('kind')!r}, expected {kind!r}"
        )
    return doc
