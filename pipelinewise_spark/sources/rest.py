"""Generic REST incremental source — the shared engine behind the
reference's SaaS tap family (tap-github, tap-jira, tap-zendesk,
tap-slack, tap-mixpanel, tap-twilio, tap-salesforce).

Every one of those taps is the same client loop with different
endpoint catalogs: authenticated GET, one of three pagination shapes,
an incremental ``since``-style bookmark on a record timestamp, and
rate-limit-aware retry. Reference anchors:

- Link-header pagination + X-RateLimit throttling: tap-github
  ``__init__.py:226-246`` (``authed_get_all_pages`` follows
  ``r.links['next']``) and ``rate_throttling:200-224`` (sleep until
  ``X-RateLimit-Reset`` when remaining hits 0);
- cursor pagination: tap-zendesk ``streams.py`` (cursor-based
  incremental exports carrying an ``after_cursor``);
- page/offset pagination + Retry-After on 429: tap-jira / tap-twilio
  client loops.

What is per-SaaS in the reference is each tap's baked-in endpoint
paths and JSON schemas; here those are CONFIG (``path``,
``records_path``, ``pagination``, replication key per table) and the
mechanism is this module — one tested loop instead of seven copies.

Scale note: a chained pagination (link/cursor — each page names the
next) is inherently sequential per stream; the distributed path
(:func:`fetch_pages_distributed`) fans page-addressable APIs out
across executors with ``mapInPandas``, one HTTP fetch per page per
task — the right shape when the API allows random page access and the
rate limit, not the driver, is the bottleneck.
"""

from __future__ import annotations

import base64
import json
import time
import urllib.error
import urllib.parse
import urllib.request
from typing import Any, Iterator

DEFAULT_TIMEOUT = 30.0
MAX_RETRIES = 5
BACKOFF_BASE_SEC = 0.5
#: hard page cap — an API whose pagination never terminates (cursor
#: echoing itself, miscounted page totals) must not loop forever
MAX_PAGES = 10_000


class RestError(RuntimeError):
    """Non-retryable HTTP failure (4xx other than 429) or retries
    exhausted."""


def auth_headers(auth: tuple | None) -> dict:
    """``("bearer", token)`` / ``("basic", user, password)`` /
    ``("header", name, value)`` → HTTP headers."""
    if auth is None:
        return {}
    kind = auth[0]
    if kind == "bearer":
        return {"Authorization": f"Bearer {auth[1]}"}
    if kind == "basic":
        cred = base64.b64encode(f"{auth[1]}:{auth[2]}".encode()).decode()
        return {"Authorization": f"Basic {cred}"}
    if kind == "header":
        return {auth[1]: auth[2]}
    raise ValueError(f"unknown auth kind {kind!r}")


def _parse_link_next(link_header: str | None) -> str | None:
    """RFC 5988 Link header → the rel="next" URL (tap-github's
    ``r.links['next']['url']``). Entries are matched as ``<url>; attrs``
    pairs — a naive split on ',' would shear URLs whose query strings
    contain commas (field lists, sort specs: routine in the Jira/Zendesk
    APIs this module covers)."""
    import re

    if not link_header:
        return None
    for m in re.finditer(r"<([^>]*)>\s*((?:;[^,<]*)*)", link_header):
        if re.search(r";\s*rel\s*=\s*[\"']?next[\"']?", m.group(2)):
            return m.group(1)
    return None


def _retry_after_seconds(value: str | None, attempt: int) -> float:
    """``Retry-After`` → seconds: delta-seconds, or an RFC 7231
    HTTP-date; falls back to exponential backoff on anything else."""
    if value:
        try:
            return float(value)
        except ValueError:
            pass
        try:
            from email.utils import parsedate_to_datetime

            dt = parsedate_to_datetime(value)
            return max(0.0, dt.timestamp() - time.time())
        except (TypeError, ValueError):
            pass
    return BACKOFF_BASE_SEC * 2 ** (attempt - 1)


def _ratelimit_wait(hdrs: dict, sleep) -> None:
    """Sleep out an exhausted ``X-RateLimit-Remaining: 0`` window
    (``X-RateLimit-Reset`` epoch — tap-github's throttle,
    ``rate_throttling:200-224``). Call this BEFORE the next request,
    never after the last one — the final page of a sync must not stall
    for a window nobody will use."""
    if hdrs.get("x-ratelimit-remaining") == "0":
        reset = float(hdrs.get("x-ratelimit-reset", 0) or 0)
        wait = max(0.0, reset - time.time())
        if wait:
            sleep(min(wait, 3600.0))


def http_get_json(
    url: str,
    *,
    headers: dict | None = None,
    timeout: float = DEFAULT_TIMEOUT,
    max_retries: int = MAX_RETRIES,
    sleep=time.sleep,
) -> tuple[Any, dict]:
    """GET → (parsed JSON body, response headers). Retries with
    exponential backoff on 5xx and connection errors; honors
    ``Retry-After`` on 429 (delta-seconds OR HTTP-date, RFC 7231).
    Rate-limit windows are the CALLER's concern between requests
    (:func:`_ratelimit_wait`) — sleeping after the last response of a
    sync would stall for a window nobody uses. Other 4xx raise
    immediately — retrying a 401/404 is noise."""
    attempt = 0
    while True:
        try:
            req = urllib.request.Request(url, headers=headers or {})
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                hdrs = {k.lower(): v for k, v in resp.headers.items()}
                body = json.loads(resp.read().decode("utf-8") or "null")
                return body, hdrs
        except urllib.error.HTTPError as e:
            status = e.code
            if status == 429 or status >= 500:
                attempt += 1
                if attempt > max_retries:
                    raise RestError(
                        f"GET {url} failed after {max_retries} retries "
                        f"(last status {status})"
                    ) from e
                wait = _retry_after_seconds(
                    e.headers.get("Retry-After"), attempt
                )
                sleep(min(wait, 3600.0))
                continue
            raise RestError(
                f"GET {url} returned {status}: "
                f"{e.read().decode('utf-8', 'replace')[:200]}"
            ) from e
        except (urllib.error.URLError, TimeoutError) as e:
            attempt += 1
            if attempt > max_retries:
                raise RestError(
                    f"GET {url} failed after {max_retries} retries: {e}"
                ) from e
            sleep(BACKOFF_BASE_SEC * 2 ** (attempt - 1))


def _dig(doc: Any, path: str) -> Any:
    """Dotted path into a JSON document; '' = the document itself."""
    if not path:
        return doc
    for key in path.split("."):
        if doc is None:
            return None
        doc = doc.get(key) if isinstance(doc, dict) else None
    return doc


def fetch_records(
    base_url: str,
    path: str,
    *,
    auth: tuple | None = None,
    params: dict | None = None,
    records_path: str = "",
    pagination: str = "link",
    cursor_param: str = "cursor",
    cursor_path: str = "meta.after_cursor",
    page_param: str = "page",
    start_page: int = 1,
    since_param: str | None = None,
    bookmark: Any = None,
    max_pages: int = MAX_PAGES,
    timeout: float = DEFAULT_TIMEOUT,
    sleep=time.sleep,
) -> Iterator[dict]:
    """Yield raw record dicts across pages.

    ``pagination``: ``"link"`` follows the Link rel=next header
    (github), ``"cursor"`` re-requests with ``cursor_param`` =
    ``cursor_path`` dug from the body until it is null/absent
    (zendesk), ``"page"`` increments ``page_param`` until a page yields
    no records (jira/twilio), ``"none"`` fetches once. ``since_param``
    + ``bookmark`` request only records changed since the last run —
    server-side filtering, the incremental contract every reference
    SaaS tap uses."""
    headers = auth_headers(auth)
    q = dict(params or {})
    if since_param is not None and bookmark is not None:
        q[since_param] = bookmark
    page = start_page
    cursor = None
    url = None
    for _ in range(max_pages):
        if url is None:
            qq = dict(q)
            if pagination == "cursor" and cursor is not None:
                qq[cursor_param] = cursor
            if pagination == "page":
                qq[page_param] = page
            url = f"{base_url.rstrip('/')}/{path.lstrip('/')}"
            if qq:
                url += ("&" if "?" in url else "?") + urllib.parse.urlencode(qq)
        body, hdrs = http_get_json(
            url, headers=headers, timeout=timeout, sleep=sleep
        )
        records = _dig(body, records_path)
        if records is None:
            if records_path:
                # a typo'd records_path silently yielding zero records
                # forever is the worst failure mode an ingest can have
                raise RestError(
                    f"records_path {records_path!r} addressed nothing "
                    f"in the response from {url}"
                )
            records = []
        if not isinstance(records, list):
            raise RestError(
                f"records_path {records_path!r} did not address a list "
                f"in the response from {url}"
            )
        yield from records
        if pagination == "none":
            return
        if pagination == "link":
            url = _parse_link_next(hdrs.get("link"))
            if url is None:
                return
        elif pagination == "cursor":
            cursor = _dig(body, cursor_path)
            if not cursor:
                return
            url = None
        else:  # page
            if not records:
                return
            page += 1
            url = None
        # another request follows — sleep out an exhausted rate window
        _ratelimit_wait(hdrs, sleep)
    raise RestError(
        f"pagination did not terminate within {max_pages} pages "
        f"({base_url}/{path})"
    )


def rest_reader(
    spark,
    base_url: str,
    path: str,
    *,
    stream: str,
    replication_key: str | None = None,
    bookmark: Any = None,
    schema=None,
    **fetch_kw,
) -> tuple[Any, Any]:
    """Bounded incremental read → ``(DataFrame, new_bookmark)``.

    The fetch runs driver-side (a rate-limited SaaS API is not a
    distributed source; the reference taps are single-threaded HTTP
    clients — parity, not a concession). Records land as JSON strings
    and parse into ``schema`` when given, else infer. Adds the
    ``_sdc_extracted_at`` / ``_sdc_source`` system columns
    (``sources/files.py`` uses the same convention). ``new_bookmark``
    is the max ``replication_key`` seen, or the input bookmark when the
    window was empty."""
    from pyspark.sql import functions as F

    rows = list(fetch_records(
        base_url, path, since_param=fetch_kw.pop("since_param", None),
        bookmark=bookmark, **fetch_kw,
    ))
    new_bookmark = bookmark
    if replication_key is not None and rows:
        seen = [r.get(replication_key) for r in rows
                if r.get(replication_key) is not None]
        if seen:
            hi = max(seen)
            new_bookmark = hi if bookmark is None else max(bookmark, hi)
    if schema is not None:
        df = spark.createDataFrame(
            [(json.dumps(r),) for r in rows], "value string"
        ).select(
            F.from_json("value", schema).alias("r")
        ).select("r.*")
    elif rows:
        df = spark.read.json(
            spark.sparkContext.parallelize([json.dumps(r) for r in rows])
        )
    else:
        # empty incremental window, no declared schema: a zero-column,
        # zero-row frame carrying only the system columns below
        df = spark.range(0).drop("id")
    df = (
        df.withColumn("_sdc_extracted_at", F.current_timestamp())
          .withColumn("_sdc_source", F.lit(f"{base_url}/{path.lstrip('/')}"))
    )
    return df, new_bookmark


def run_rest_sync(
    spark,
    *,
    table,
    spec: dict,
    stream: str,
    auth: tuple | None = None,
    transform=None,
    schema_drift: bool = True,
    timeout: float = DEFAULT_TIMEOUT,
) -> dict:
    """One bounded incremental pull → MERGE → bookmark commit for a
    REST-family stream — ``run_tap`` for a SaaS tap (the reference's
    sync loop: fetch the window since the bookmark, upsert, write
    state; e.g. tap-github ``__init__.py:381-391`` writes the ``since``
    bookmark after each stream).

    ``spec`` is the :func:`pipelinewise_spark.config.reader_spec`
    rendering. The change batch derives ``lsn`` from the replication
    key (numeric → cast; timestamp/ISO-string → epoch-µs), so merge
    ordering matches the API's own change order. The merge runs with
    ``filter_applied_lsn=False``: the API's ``since`` filter already
    bounds the window server-side, and the strict bookmark prefix
    filter would silently drop a record whose key TIES the bookmark —
    coarse second-granularity keys tie routinely, and several APIs'
    ``since`` is inclusive (github). Re-fetched unchanged rows then
    re-upsert idempotently instead of being filtered; records with a
    NULL replication key are likewise merged (NULL lsn never wins a
    tie but is never dropped). A FULL_TABLE pull (no replication key)
    stamps ``bookmark lsn + 1`` and reconciles: rows the API no longer
    returns are vanish-DELETED (one left-anti join, the
    ``cdc/partial.py`` shape) — the window IS the whole table. The raw
    replication-key value is persisted as ``replication_key_value`` in
    the stream bookmark (a separate metadata commit AFTER the merge —
    a crash between the two re-fetches the last window and the upserts
    replay idempotently).

    ``schema_drift`` (default on) is S17 for the SaaS family: fields
    that appear upstream but are missing from the stored table schema
    are ADD-COLUMNed (metadata-only evolve; historical rows read NULL)
    before the merge, exactly the reference targets' new-column rule
    (``target_postgres/db_sync.py:539-549``). Add-only by design: the
    incoming schema is JSON-INFERRED (every int arrives as long, every
    all-null window as string), so driving version/promote off it would
    churn columns on inference noise — existing columns always CAST to
    their stored types instead. With drift off, records parse strictly
    through the stored schema and unknown fields are silently dropped
    (the pre-drift behavior)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from pipelinewise_spark.cdc.merge import merge_into
    from pipelinewise_spark.lake.table import SDC_DELETED_AT

    kw = dict(spec["kwargs"])
    kw.pop("stream", None)
    base_url, path = kw.pop("base_url"), kw.pop("path")
    rk = kw.pop("replication_key", None)
    payload = T.StructType(
        [f for f in table.logical_schema.fields if f.name in table.data_cols]
    )
    bm = table.bookmarks.get(stream, {})
    df, new_rk = rest_reader(
        spark, base_url, path, stream=stream,
        replication_key=rk, bookmark=bm.get("replication_key_value"),
        schema=None if schema_drift else payload,
        auth=auth, timeout=timeout, **kw,
    )
    df = df.drop("_sdc_extracted_at", "_sdc_source")
    n = df.count()
    if n == 0:
        return {"rows": 0, "stream": stream,
                "bookmark": bm.get("replication_key_value")}
    if schema_drift:
        from pipelinewise_spark.lake.table import METADATA_COLS

        reserved = {"op", "lsn", "_bucket"} | set(METADATA_COLS)
        new_fields = [f for f in df.schema.fields
                      if f.name not in payload.names]
        clash = sorted(f.name for f in new_fields if f.name in reserved)
        if clash:
            raise ValueError(
                f"{stream}: upstream added field(s) {clash} that collide "
                f"with the engine's merge columns — rename them upstream "
                f"or map them in a transform"
            )
        if new_fields:
            table.evolve([
                {"action": "add_column", "name": f.name,
                 "type": json.loads(f.dataType.json())}
                for f in new_fields
            ])
            payload = T.StructType([
                f for f in table.logical_schema.fields
                if f.name in table.data_cols
            ])
        # align to the stored schema: inferred columns CAST to their
        # declared types, columns absent from this window read NULL
        df = df.select(*[
            (F.col(f.name).cast(f.dataType) if f.name in df.columns
             else F.lit(None).cast(f.dataType)).alias(f.name)
            for f in payload.fields
        ])
    if transform is not None:
        df = transform(df)
    if rk is not None:
        if rk not in payload.names:
            raise ValueError(
                f"{stream}: replication_key {rk!r} is not a payload "
                f"column ({payload.names})"
            )
        dt = payload[rk].dataType
        if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType)):
            lsn = F.col(rk).cast("long")
        elif isinstance(dt, T.TimestampType):
            lsn = F.unix_micros(F.col(rk))
        elif isinstance(dt, T.StringType):
            lsn = F.unix_micros(F.to_timestamp(F.col(rk)))
        else:
            raise ValueError(
                f"{stream}: cannot derive a merge LSN from "
                f"replication_key {rk!r} of type {dt.simpleString()}"
            )
        bad = df.where(F.col(rk).isNotNull() & lsn.isNull()).limit(1)
        if bad.count():
            raise ValueError(
                f"{stream}: replication_key {rk!r} values do not parse "
                f"as timestamps — cannot order the merge"
            )
    else:
        lsn = F.lit(int(bm.get("lsn", 0) or 0) + 1)
    ev = df.withColumn("op", F.lit("U")).withColumn(
        "lsn", lsn.cast("long")
    )
    if rk is None and table.key_cols:
        # FULL_TABLE reconcile: the fetch IS the table — rows the API
        # stopped returning vanish-delete (partial.py's left-anti shape
        # over the whole key space)
        keys = list(table.key_cols)
        # soft-delete tables keep tombstones visible in read(); without
        # the IS NULL filter every run would re-emit D ops for all
        # historically-deleted keys at a fresh LSN (repeat bucket
        # rewrites growing with all-time deletes)
        tgt = table.read()
        if SDC_DELETED_AT in tgt.columns:
            tgt = tgt.where(F.col(SDC_DELETED_AT).isNull())
        gone = tgt.select(*keys).join(
            df.select(*keys), on=keys, how="left_anti"
        )
        if gone.limit(1).count():
            deletes = gone.select(
                *[
                    (F.col(f.name) if f.name in keys
                     else F.lit(None).cast(f.dataType)).alias(f.name)
                    for f in payload.fields
                ],
                F.lit("D").alias("op"),
                F.lit(int(bm.get("lsn", 0) or 0) + 1).cast("long")
                .alias("lsn"),
            )
            ev = ev.unionByName(deletes)
    metrics = merge_into(
        table, ev, stream=stream, batch_id=None,
        filter_applied_lsn=False,
    )
    if new_rk is not None and new_rk != bm.get("replication_key_value"):
        table.commit(
            bookmarks={stream: {"replication_key_value": new_rk}},
            summary={"operation": "rest_bookmark", "stream": stream},
        )
    return {**metrics, "rows_fetched": n, "stream": stream,
            "bookmark": new_rk}


def fetch_pages_distributed(
    spark,
    base_url: str,
    path: str,
    *,
    n_pages: int,
    auth: tuple | None = None,
    params: dict | None = None,
    records_path: str = "",
    page_param: str = "page",
    start_page: int = 1,
    schema=None,
    timeout: float = DEFAULT_TIMEOUT,
):
    """Executor-parallel fetch of a PAGE-ADDRESSABLE endpoint: one HTTP
    GET per page per task via ``mapInPandas`` (Arrow-batched; no
    per-row Python). Returns a DataFrame of the parsed records.

    Use when the API allows random page access and the rate limit —
    not the driver — bounds throughput; each executor retries/backs
    off independently through :func:`http_get_json`."""
    import pandas as pd
    from pyspark.sql import functions as F

    pages = spark.range(start_page, start_page + n_pages).select(
        F.col("id").cast("int").alias("page")
    )
    base = base_url  # close over plain values only (pickled to workers)
    q = dict(params or {})
    hdrs = auth_headers(auth)

    def fetch(batches):
        for pdf in batches:
            out = []
            last_hdrs = None
            for page in pdf["page"]:
                if last_hdrs is not None:
                    _ratelimit_wait(last_hdrs, time.sleep)
                qq = {**q, page_param: int(page)}
                url = f"{base.rstrip('/')}/{path.lstrip('/')}"
                url += ("&" if "?" in url else "?") + urllib.parse.urlencode(qq)
                body, last_hdrs = http_get_json(
                    url, headers=hdrs, timeout=timeout
                )
                recs = _dig(body, records_path)
                if recs is None and records_path:
                    # same loud contract as fetch_records — a typo'd
                    # records_path must not read as "zero records"
                    raise RestError(
                        f"records_path {records_path!r} addressed "
                        f"nothing in the response from {url}"
                    )
                if recs is None:
                    recs = []
                if not isinstance(recs, list):
                    raise RestError(
                        f"records_path {records_path!r} did not address "
                        f"a list in the response from {url}"
                    )
                out.extend(json.dumps(r) for r in recs)
            yield pd.DataFrame({"value": out})

    raw = pages.repartition(max(1, min(n_pages, 64))).mapInPandas(
        fetch, "value string"
    )
    if schema is not None:
        return raw.select(F.from_json("value", schema).alias("r")).select("r.*")
    return raw
