"""Document deduplication operators: exact, token-Jaccard, MinHash+LSH,
SimHash.

Scale design: exact dedup is a hash groupBy (one shuffle). Near-dup at
100 TB uses MinHash signatures + LSH banding so the candidate join is an
equi-join on band buckets (shuffle keyed by bucket) instead of an O(n²)
similarity join; the pairwise Jaccard verify runs only on candidates.
All hash functions are md5/xxhash-based column expressions — deterministic,
engine-portable (the DuckDB oracle reproduces md5-min signatures exactly),
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_set(df: DataFrame, id_col: str, text_col: str, delim: str = " ") -> DataFrame:
    """Distinct (id, token) pairs — the set representation for Jaccard."""
    return (
        df.select(F.col(id_col), F.explode(F.split(F.lower(F.col(text_col)), delim)).alias("w"))
        .where(F.col("w") != "")
        .distinct()
    )


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact near-identity dedup: md5 fingerprint of normalized text →
    group size + canonical (min) id. One hash-aggregate shuffle."""
    from pipelinewise_spark.functions.text import fingerprint

    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def _set_jaccard_pairs(ws: DataFrame, id_col: str, threshold: float) -> DataFrame:
    """All pairs (a < b) with set Jaccard ≥ threshold over (id, element)
    rows. Exact but quadratic in docs-per-shared-element — the verify
    stage of LSH, or a standalone for small corpora."""
    sizes = ws.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = ws.alias("a")
    b = ws.alias("b")
    shared = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("shared") / (F.col("sz_a") + F.col("sz_b") - F.col("shared")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def token_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    threshold: float = 0.8,
    delim: str = " ",
) -> DataFrame:
    """Word-token Jaccard near-dup pairs. Columns: id_a, id_b, jaccard."""
    return _set_jaccard_pairs(word_set(df, id_col, text_col, delim), id_col, threshold)


def ngram_set(df: DataFrame, id_col: str, text_col: str, *, n: int = 5) -> DataFrame:
    """Distinct character n-gram shingles per doc (lowercased). Texts
    shorter than ``n`` contribute their whole text as one shingle. Pure
    expressions: sequence → transform → explode, no Python."""
    norm = F.lower(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1))),
        lambda i: norm.substr(i, F.lit(n)),
    )
    return (
        df.select(F.col(id_col), F.explode(grams).alias("w"))
        .where(F.length("w") > 0)
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 5,
    threshold: float = 0.7,
) -> DataFrame:
    """Character n-gram (shingle) Jaccard near-dup pairs — finer-grained
    than word tokens (robust to punctuation/compounding); the classic
    shingling front-end of MinHash. Columns: id_a, id_b, jaccard."""
    return _set_jaccard_pairs(ngram_set(df, id_col, text_col, n=n), id_col, threshold)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 16,
    delim: str = " ",
) -> DataFrame:
    """MinHash signature: h_i(doc) = min over tokens of md5(i || '|' ||
    token). Min over lexicographic hex strings — identical in any engine.

    Physical shape (r8): ONE explode of the per-row DISTINCT token
    array straight into the groupBy's partial aggregate — the old
    ``word_set`` route paid a global (id, token) DISTINCT shuffle of
    every token occurrence before aggregating. Token-level rows now
    never shuffle at all (the md5 mins collapse map-side to one row per
    doc) and the input is spread across cores first (the bench corpus
    is a single row-group file → 2 scan partitions). Values are
    unchanged: min() is insensitive to duplicate tokens, so per-row
    ``array_distinct`` + partial agg ≡ global distinct + agg."""
    from pipelinewise_spark.functions.util import spread_to_cores

    toks = F.array_distinct(F.split(F.lower(F.col(text_col)), delim))
    ws = (
        spread_to_cores(df, id_col)
        .select(F.col(id_col), F.explode(toks).alias("w"))
        .where(F.col("w") != "")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("w")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return ws.groupBy(id_col).agg(*aggs)


def band_rows(
    signatures: DataFrame,
    id_col: str,
    *,
    num_hashes: int = 16,
    bands: int = 4,
    with_slices: bool = False,
) -> DataFrame:
    """THE banding: signature frame (id, mh0..mhN) → one row per
    (id, band) with ``bkt`` = md5 over '|'-joined hashes of the band's
    ``num_hashes/bands``-hash slice. :func:`lsh_candidate_pairs`, the
    persisted index (:mod:`..dedup_index`), and the DuckDB oracles all
    consume this ONE definition — correctness of index/oracle parity
    pins on it never forking. ``with_slices`` adds ``mhs``, the band's
    raw signature slice (what the index stores so probes can price
    candidates by agreement without re-reading document text)."""
    rows = num_hashes // bands
    buckets = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows + r}") for r in range(rows)]
        fields = [
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *cols)).alias("bkt"),
        ]
        if with_slices:
            fields.append(F.array(*cols).alias("mhs"))
        buckets.append(F.struct(*fields))
    return signatures.select(
        F.col(id_col), F.explode(F.array(*buckets)).alias("bb")
    ).select(id_col, "bb.*")


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    *,
    num_hashes: int = 16,
    bands: int = 4,
    broadcast: bool = False,
) -> DataFrame:
    """Band the signature (rows = num_hashes/bands) and emit doc pairs
    sharing at least one band bucket. The join is an equi-join on
    (band, bucket) — linear shuffle, no cross product. ``broadcast``
    hints one side of the self-join: right for batch-sized inputs with
    no stats (a localCheckpointed ingest batch would otherwise
    sort-merge), wrong for corpus-scale offline dedup (the default)."""
    exploded = band_rows(signatures, id_col,
                         num_hashes=num_hashes, bands=bands)
    if broadcast:
        a, b_ = F.broadcast(exploded).alias("a"), exploded.alias("b")
    else:
        a, b_ = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_for_pairs(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    delim: str = " ",
) -> DataFrame:
    """Exact token-set Jaccard computed ONLY for the given (id_a, id_b)
    pairs — the verify stage of LSH. Work is O(|pairs| x doc length), not
    O(n^2): the word sets join against the candidate list first."""
    ws = word_set(df, id_col, text_col, delim)
    sizes = ws.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    wa = ws.select(F.col(id_col).alias("id_a"), F.col("w"))
    wb = ws.select(F.col(id_col).alias("__idb"), F.col("w").alias("__wb"))
    shared = (
        pairs.join(wa, "id_a")
        .join(wb, (F.col("id_b") == F.col("__idb")) & (F.col("w") == F.col("__wb")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("shared") / (F.col("sz_a") + F.col("sz_b") - F.col("shared")), 6
            ).alias("jaccard"),
        )
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
    delim: str = " ",
) -> DataFrame:
    """Full MinHash-LSH near-dup: signatures → band buckets → candidate
    pairs → exact Jaccard verify ≥ threshold, computed only over the
    candidates (the whole point of LSH — no O(n^2) verify)."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes=num_hashes, delim=delim)
    cands = lsh_candidate_pairs(sigs, id_col, num_hashes=num_hashes, bands=bands)
    verified = jaccard_for_pairs(cands, df, id_col, text_col, delim=delim)
    return verified.where(F.col("jaccard") >= threshold)


def minhash_signature_groups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 16,
    delim: str = " ",
) -> DataFrame:
    """Near-dup CLUSTERS by identical full MinHash signature — the scale
    path for duplicate-heavy corpora, where pair listing is inherently
    O(cluster²) (a 1000-way duplicate cluster is 500k pairs but ONE
    group row). Identical 16-hash signatures imply near-identical token
    sets; one explode + one groupBy + one hash-agg, fully linear.
    Columns: sig, group_size, canonical_id."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes=num_hashes, delim=delim)
    sig = F.md5(F.concat_ws("|", *[F.col(f"mh{i}") for i in range(num_hashes)]))
    return (
        sigs.select(F.col(id_col), sig.alias("sig"))
        .groupBy("sig")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def simhash64(df: DataFrame, id_col: str, text_col: str, delim: str = " ") -> DataFrame:
    """64-bit SimHash: per token take a 64-bit hash, add ±1 per bit
    position weighted by presence, sign → bit. Implemented as 64
    conditional sums over the exploded token set — heavy but pure-JVM;
    used for hamming-distance near-dup where MinHash recall is too coarse.

    The token hash is the first 16 hex nibbles of md5 (bit ``b`` = bit
    ``b % 4`` of nibble ``b // 4``) — md5 rather than xxhash64 so any SQL
    engine reproduces the signature exactly (same portability trick as
    :func:`minhash_signatures`)."""
    ws = word_set(df, id_col, text_col, delim).withColumn(
        "__h", F.md5(F.col("w"))
    )
    aggs = []
    for bit in range(64):
        nibble = F.conv(F.substring(F.col("__h"), bit // 4 + 1, 1), 16, 10).cast("int")
        bitval = F.shiftright(nibble, bit % 4).bitwiseAND(F.lit(1))
        aggs.append(F.sum(F.when(bitval == 1, 1).otherwise(-1)).alias(f"b{bit}"))
    sums = ws.groupBy(id_col).agg(*aggs)
    sig = None
    for bit in range(64):
        term = F.when(F.col(f"b{bit}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(2**bit if bit < 63 else -(2**63)).cast("long")
        sig = term if sig is None else sig + term
    return sums.select(F.col(id_col), sig.alias("simhash"))


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    *,
    max_iters: int = 20,
) -> DataFrame:
    """Transitive duplicate-cluster resolution: connected components
    over the (undirected) verified-pair graph, by iterative min-label
    propagation — each node adopts the minimum label among itself and
    its neighbors until fixpoint, so ``component`` = the smallest doc
    id reachable from the node. This closes the gap between PAIR
    listing (A~B, B~C) and the CLUSTER a dedup policy actually needs
    ({A,B,C} keep-one): pairwise survivors can drop both B and C while
    keeping near-dup A, or keep two transitively-equal docs.

    Spark shape: the canonical iterative-algorithm loop (same as the
    k-means quantizer, functions/ann.py) — per iteration one join + one
    groupBy(min), a SCALAR changed-count probe on the driver, results
    persisted per round to cut lineage. Iterations needed = graph
    diameter; near-dup clusters are dense (diameter 2-3 in practice).
    Raises if ``max_iters`` rounds don't converge rather than returning
    a partial labeling — for adversarial chain-shaped graphs raise the
    bound (or precluster with :func:`minhash_signature_groups`).
    Only nodes that appear in some pair are labeled; singletons are
    their own trivial components and never enter the shuffle."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist()
    )
    try:
        for _ in range(max_iters):
            nb = (
                edges.join(labels, edges["dst"] == labels["node"])
                .groupBy("src")
                .agg(F.min("comp").alias("nb_comp"))
            )
            merged = labels.join(
                nb, labels["node"] == nb["src"], "left"
            ).select(
                labels["node"],
                F.col("comp").alias("old_comp"),
                F.least(
                    F.col("comp"), F.coalesce("nb_comp", "comp")
                ).alias("comp"),
            )
            new_labels = merged.select("node", "comp").persist()
            changed = (
                merged.where(F.col("comp") < F.col("old_comp"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                # materialize the result OUTSIDE the cache (localCheckpoint
                # storage is released by the ContextCleaner when the DF is
                # GC'd) so the loop's persisted frame can be freed here —
                # returning the persisted DF itself would leak one cached
                # labeling per call into executor storage
                out = labels.select(
                    F.col("node").alias("doc_id"),
                    F.col("comp").alias("component"),
                ).localCheckpoint(eager=True)
                labels.unpersist()
                return out
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            f"iterations; raise max_iters (graph diameter exceeds bound)"
        )
    finally:
        labels.unpersist()
        edges.unpersist()
