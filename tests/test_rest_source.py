"""Generic REST incremental source (the reference's SaaS tap family:
tap-github Link-header pagination + throttling, tap-zendesk cursors,
tap-jira/twilio page loops) against a real local HTTP server."""

from __future__ import annotations

import json
import os
import sys
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipelinewise_spark.sources.rest import (
    RestError,
    fetch_pages_distributed,
    fetch_records,
    http_get_json,
    rest_reader,
)

ITEMS = [{"id": i, "updated_at": f"2026-01-{i + 1:02d}"} for i in range(7)]


class _Api(BaseHTTPRequestHandler):
    hits: dict[str, int] = {}

    def _send(self, status, body, extra_headers=None):
        payload = json.dumps(body).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        for k, v in (extra_headers or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(payload)

    def do_GET(self):
        u = urllib.parse.urlparse(self.path)
        q = dict(urllib.parse.parse_qsl(u.query))
        route = u.path
        type(self).hits[route] = type(self).hits.get(route, 0) + 1
        base = f"http://{self.headers['Host']}"

        if route == "/linked":
            page = int(q.get("page", 1))
            chunk = ITEMS[(page - 1) * 3:page * 3]
            headers = {}
            if page * 3 < len(ITEMS):
                headers["Link"] = (
                    f'<{base}/linked?page={page + 1}>; rel="next", '
                    f'<{base}/linked?page=99>; rel="last"'
                )
            self._send(200, chunk, headers)
        elif route == "/paged":
            page = int(q.get("page", 1))
            self._send(200, {"items": ITEMS[(page - 1) * 3:page * 3]})
        elif route == "/cursored":
            cur = int(q.get("cursor", 0))
            nxt = cur + 3
            body = {
                "records": ITEMS[cur:nxt],
                "meta": {"after_cursor": nxt if nxt < len(ITEMS) else None},
            }
            self._send(200, body)
        elif route == "/flaky":
            if type(self).hits[route] == 1:
                self._send(500, {"err": "boom"})
            else:
                self._send(200, [{"id": 1}])
        elif route == "/limited":
            if type(self).hits[route] == 1:
                self._send(429, {"err": "slow down"}, {"Retry-After": "0"})
            else:
                self._send(200, [{"id": 2}])
        elif route == "/limited_date":
            # RFC 7231 allows an HTTP-date Retry-After (GitHub emits both)
            if type(self).hits[route] == 1:
                from email.utils import formatdate

                self._send(429, {"err": "slow down"},
                           {"Retry-After": formatdate(usegmt=True)})
            else:
                self._send(200, [{"id": 4}])
        elif route == "/throttled":
            # linked pages that exhaust the rate window on EVERY response
            import time as _t

            page = int(q.get("page", 1))
            chunk = ITEMS[(page - 1) * 3:page * 3]
            headers = {
                "X-RateLimit-Remaining": "0",
                "X-RateLimit-Reset": str(int(_t.time()) + 5),
            }
            if page * 3 < len(ITEMS):
                headers["Link"] = f'<{base}/throttled?page={page + 1}>; rel="next"'
            self._send(200, chunk, headers)
        elif route == "/since":
            bm = q.get("since", "")
            self._send(200, [r for r in ITEMS if r["updated_at"] > bm])
        elif route == "/secret":
            if self.headers.get("Authorization") != "Bearer tok-1":
                self._send(401, {"err": "auth"})
            else:
                self._send(200, [{"id": 3}])
        else:
            self._send(404, {"err": "no such route"})

    def log_message(self, *a):
        pass


@pytest.fixture()
def api():
    _Api.hits = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Api)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}"
    finally:
        srv.shutdown()


def test_link_header_pagination(api):
    got = list(fetch_records(api, "/linked"))
    assert got == ITEMS
    assert _Api.hits["/linked"] == 3  # ceil(7/3) pages, no extra probe


def test_page_pagination_with_records_path(api):
    got = list(fetch_records(api, "/paged", pagination="page",
                             records_path="items"))
    assert got == ITEMS
    assert _Api.hits["/paged"] == 4  # 3 full + 1 empty terminator


def test_cursor_pagination(api):
    got = list(fetch_records(api, "/cursored", pagination="cursor",
                             records_path="records",
                             cursor_path="meta.after_cursor"))
    assert got == ITEMS
    assert _Api.hits["/cursored"] == 3


def test_retry_on_500_and_429(api):
    naps = []
    assert list(fetch_records(api, "/flaky", pagination="none",
                              sleep=naps.append)) == [{"id": 1}]
    assert _Api.hits["/flaky"] == 2 and naps  # backed off once
    assert list(fetch_records(api, "/limited", pagination="none",
                              sleep=naps.append)) == [{"id": 2}]
    assert _Api.hits["/limited"] == 2


def test_4xx_raises_immediately(api):
    with pytest.raises(RestError, match="404"):
        list(fetch_records(api, "/nope", pagination="none"))
    assert _Api.hits["/nope"] == 1  # no retries on a hard 4xx


def test_bearer_auth(api):
    with pytest.raises(RestError, match="401"):
        list(fetch_records(api, "/secret", pagination="none"))
    got = list(fetch_records(api, "/secret", pagination="none",
                             auth=("bearer", "tok-1")))
    assert got == [{"id": 3}]


def test_bad_records_path_is_loud(api):
    with pytest.raises(RestError, match="records_path"):
        list(fetch_records(api, "/paged", pagination="none",
                           records_path="wrong.place2"))


def test_link_header_urls_with_commas():
    """A rel=next URL whose query string contains commas (field lists,
    sort specs — routine in Jira/Zendesk) must come back intact; a naive
    split on ',' shears it."""
    from pipelinewise_spark.sources.rest import _parse_link_next

    h = ('<https://api.example.com/items?fields=id,name,updated&page=2>; '
         'rel="next", <https://api.example.com/items?page=9>; rel="last"')
    assert _parse_link_next(h) == (
        "https://api.example.com/items?fields=id,name,updated&page=2"
    )
    # bare (unquoted) rel token — several APIs emit rel=next unquoted
    assert _parse_link_next("<https://x/b?a=1,2>; rel=next") == "https://x/b?a=1,2"
    assert _parse_link_next('<https://x/a>; rel="last"') is None
    assert _parse_link_next(None) is None


def test_retry_after_formats():
    """Retry-After: delta-seconds, HTTP-date, or garbage → backoff.
    The HTTP-date form used to raise an uncaught ValueError from inside
    the 429 handler."""
    import datetime
    from email.utils import format_datetime

    from pipelinewise_spark.sources.rest import (
        BACKOFF_BASE_SEC, _retry_after_seconds,
    )

    assert _retry_after_seconds("2.5", 1) == 2.5
    future = datetime.datetime.now(datetime.timezone.utc) + \
        datetime.timedelta(seconds=30)
    assert 0 <= _retry_after_seconds(format_datetime(future), 1) <= 31
    past = datetime.datetime.now(datetime.timezone.utc) - \
        datetime.timedelta(seconds=30)
    assert _retry_after_seconds(format_datetime(past), 1) == 0.0
    assert _retry_after_seconds("soon-ish", 3) == BACKOFF_BASE_SEC * 4
    assert _retry_after_seconds(None, 1) == BACKOFF_BASE_SEC


def test_retry_after_http_date_through_429(api):
    """End-to-end: a 429 carrying an HTTP-date Retry-After retries
    instead of crashing."""
    naps = []
    got = list(fetch_records(api, "/limited_date", pagination="none",
                             sleep=naps.append))
    assert got == [{"id": 4}]
    assert _Api.hits["/limited_date"] == 2 and len(naps) == 1


def test_ratelimit_wait_is_deferred_to_next_request(api):
    """An exhausted X-RateLimit window sleeps BEFORE the next request,
    never after the last one — a one-shot or final page must not stall
    for a window nobody uses."""
    naps = []
    # 3 linked pages, remaining=0 on every response: sleep between
    # pages only → exactly 2 naps, each ~the 5 s reset window
    got = list(fetch_records(api, "/throttled", sleep=naps.append))
    assert got == ITEMS
    assert len(naps) == 2 and all(0 < n <= 6 for n in naps)
    # one-shot fetch of the same throttled route: zero naps
    naps.clear()
    got = list(fetch_records(api, "/throttled", pagination="none",
                             sleep=naps.append))
    assert got == ITEMS[:3] and naps == []


def test_latest_per_key_null_lsn_never_wins_never_drops(spark):
    """REST rows with a NULL replication key carry a NULL lsn into the
    merge: within a batch a NULL lsn must lose every tie against a real
    lsn, and an all-NULL key must still survive dedup (not vanish)."""
    from pipelinewise_spark.cdc.dedup import latest_per_key

    df = spark.createDataFrame(
        [(1, 5, "real"), (1, None, "null-lsn"), (2, None, "only-null")],
        "id int, lsn long, val string",
    )
    got = {r["id"]: r["val"] for r in latest_per_key(df, ["id"]).collect()}
    assert got == {1: "real", 2: "only-null"}


def test_rest_reader_incremental_bookmark(spark, api):
    schema = "id bigint, updated_at string"
    df, bm = rest_reader(
        spark, api, "/since", stream="s", pagination="none",
        since_param="since", bookmark="2026-01-04",
        replication_key="updated_at", schema=schema,
    )
    rows = {r["id"] for r in df.collect()}
    assert rows == {4, 5, 6}  # updated_at > bookmark, server-side filter
    assert bm == "2026-01-07"
    assert {"_sdc_extracted_at", "_sdc_source"} <= set(df.columns)

    # empty window: bookmark carries, frame is empty, no crash
    df2, bm2 = rest_reader(
        spark, api, "/since", stream="s", pagination="none",
        since_param="since", bookmark="2026-12-31",
        replication_key="updated_at", schema=schema,
    )
    assert df2.count() == 0 and bm2 == "2026-12-31"


def test_fetch_pages_distributed(spark, api):
    """Executor-parallel page fetch (mapInPandas) returns the same
    records as the sequential loop."""
    df = fetch_pages_distributed(
        spark, api, "/paged", n_pages=4, records_path="items",
        schema="id bigint, updated_at string",
    )
    assert {r["id"] for r in df.collect()} == {r["id"] for r in ITEMS}


def test_cli_discover_tap_rest(spark, api, capsys):
    """discover_tap --rest-url: one bounded page, inferred schema →
    Singer catalog entry (the SaaS taps' discover mode)."""
    from jobs.cli import main as cli_main

    rc = cli_main([
        "discover_tap", "--rest-url", api, "--rest-path", "/paged",
        "--records-path", "items", "--stream", "issues",
        "--key-properties", "id",
    ])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    streams = {s["tap_stream_id"]: s for s in doc["streams"]}
    assert "issues" in streams
    props = streams["issues"]["schema"]["properties"]
    assert {"id", "updated_at"} <= set(props)


def test_run_cdc_rest_project_sync(spark, tmp_path):
    """run_tap for a SaaS tap: `run_cdc --project <rest tap yaml>` pulls
    the window since the bookmark, merges, persists the raw
    replication-key bookmark; the rerun fetches ONLY the delta."""
    from jobs.run_cdc import main as run_cdc_main
    from pipelinewise_spark.lake.table import LakeTable

    upstream = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hi",
         "tool": None, "ts": "2026-01-01T00:00:00Z"},
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": "yo",
         "tool": None, "ts": "2026-01-02T00:00:00Z"},
        {"conv_id": "c2", "turn_idx": 0, "role": "user", "text": "q",
         "tool": None, "ts": "2026-01-02T00:00:00Z"},
    ]
    seen_auth = []

    class _Tap(BaseHTTPRequestHandler):
        def do_GET(self):
            u = urllib.parse.urlparse(self.path)
            q = dict(urllib.parse.parse_qsl(u.query))
            seen_auth.append(self.headers.get("Authorization"))
            since = q.get("since", "")
            live = [r for r in upstream if r["ts"] > since]
            body = json.dumps(live).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Tap)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        proj = tmp_path / "tap_rest.yml"
        proj.write_text(f"""
id: saas
type: tap-rest
db_conn:
  base_url: http://127.0.0.1:{srv.server_port}
  token: tk-1
target: lake
schemas:
  - source_schema: api
    tables:
      - table_name: conversations
        replication_method: INCREMENTAL
        replication_key: ts
        key_properties: [conv_id, turn_idx]
        path: /conversations
        pagination: none
        since_param: since
""")
        lake = str(tmp_path / "lake")
        assert run_cdc_main(["--project", str(proj), "--table", lake,
                             "--num-buckets", "4"]) == 0
        t = LakeTable(spark, f"{lake}/api/conversations")
        assert t.read().count() == 3
        bm = t.bookmarks["api-conversations"]
        assert bm["replication_key_value"] == "2026-01-02T00:00:00Z"
        assert seen_auth[-1] == "Bearer tk-1"

        # upstream change: one new turn + one edited (newer ts)
        upstream.append(
            {"conv_id": "c2", "turn_idx": 1, "role": "assistant",
             "text": "a", "tool": None, "ts": "2026-01-03T00:00:00Z"})
        upstream[0] = {**upstream[0], "text": "hi (edited)",
                       "ts": "2026-01-04T00:00:00Z"}
        n_req_before = len(seen_auth)
        assert run_cdc_main(["--project", str(proj), "--table", lake,
                             "--num-buckets", "4"]) == 0
        assert len(seen_auth) > n_req_before
        t = t.refresh()
        rows = {(r["conv_id"], r["turn_idx"]): r["text"]
                for r in t.read().collect()}
        assert rows[("c1", 0)] == "hi (edited)"
        assert rows[("c2", 1)] == "a"
        assert len(rows) == 4
        assert (t.bookmarks["api-conversations"]["replication_key_value"]
                == "2026-01-04T00:00:00Z")

        # quiet window: rerun is a clean no-op
        assert run_cdc_main(["--project", str(proj), "--table", lake,
                             "--num-buckets", "4"]) == 0
        assert t.refresh().read().count() == 4
    finally:
        srv.shutdown()


class _MutableUpstream:
    """Tiny API over a mutable record list: GET /items returns every
    record whose ``updated_at`` >= ``since`` (INCLUSIVE, like GitHub's
    ``since``) plus any record with a NULL ``updated_at``."""

    def __init__(self):
        self.records: list[dict] = []
        outer = self

        class _H(BaseHTTPRequestHandler):
            def do_GET(self):
                q = dict(urllib.parse.parse_qsl(
                    urllib.parse.urlparse(self.path).query))
                since = q.get("since")
                live = [r for r in outer.records
                        if r.get("updated_at") is None
                        or since is None or r["updated_at"] >= since]
                body = json.dumps(live).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        self.srv = ThreadingHTTPServer(("127.0.0.1", 0), _H)
        threading.Thread(target=self.srv.serve_forever, daemon=True).start()
        self.url = f"http://127.0.0.1:{self.srv.server_port}"

    def stop(self):
        self.srv.shutdown()


def test_run_rest_sync_bookmark_tie_and_null_key(spark, tmp_path):
    """Two silent-data-loss regressions: (1) a record whose replication
    key TIES the persisted bookmark (coarse timestamps tie routinely;
    GitHub's ``since`` is inclusive) must still merge — the strict
    bookmark prefix filter used to drop it forever; (2) a record with a
    NULL replication key must merge, not be filtered by ``NULL > lsn``."""
    from pyspark.sql import types as T

    from pipelinewise_spark.lake.table import LakeTable
    from pipelinewise_spark.sources.rest import run_rest_sync

    up = _MutableUpstream()
    try:
        up.records = [
            {"id": 1, "updated_at": "2026-01-01T00:00:00Z", "val": "a"},
            {"id": 2, "updated_at": "2026-01-02T00:00:00Z", "val": "b"},
        ]
        schema = T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("updated_at", T.StringType()),
            T.StructField("val", T.StringType()),
        ])
        table = LakeTable.create(spark, str(tmp_path / "t"), schema,
                                 ["id"], num_buckets=4)
        spec = {"kwargs": {
            "stream": "s-items", "base_url": up.url, "path": "/items",
            "records_path": "", "pagination": "none",
            "replication_key": "updated_at", "since_param": "since",
        }}
        m1 = run_rest_sync(spark, table=table, spec=spec, stream="s-items")
        assert m1["rows_fetched"] == 2
        assert (table.refresh().bookmarks["s-items"]
                ["replication_key_value"] == "2026-01-02T00:00:00Z")

        # upstream: record 2 edited at the SAME timestamp as the
        # bookmark; record 3 arrives with a NULL replication key
        up.records[1] = {**up.records[1], "val": "b-edited"}
        up.records.append({"id": 3, "updated_at": None, "val": "c"})
        table = table.refresh()
        m2 = run_rest_sync(spark, table=table, spec=spec, stream="s-items")
        assert m2["rows_fetched"] == 2  # server window: tie + null only
        rows = {r["id"]: r["val"] for r in table.refresh().read().collect()}
        assert rows == {1: "a", 2: "b-edited", 3: "c"}
    finally:
        up.stop()


def test_run_rest_sync_full_table_vanish_delete(spark, tmp_path):
    """A FULL_TABLE pull IS the table: rows the API stops returning are
    vanish-deleted on the next sync (the upsert-only regression left
    them in the lake forever)."""
    from pyspark.sql import types as T

    from pipelinewise_spark.lake.table import LakeTable
    from pipelinewise_spark.sources.rest import run_rest_sync

    up = _MutableUpstream()
    try:
        up.records = [{"id": i, "updated_at": None, "val": f"v{i}"}
                      for i in (1, 2, 3)]
        schema = T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("updated_at", T.StringType()),
            T.StructField("val", T.StringType()),
        ])
        table = LakeTable.create(spark, str(tmp_path / "t"), schema,
                                 ["id"], num_buckets=4)
        spec = {"kwargs": {
            "stream": "s-col", "base_url": up.url, "path": "/items",
            "records_path": "", "pagination": "none",
        }}
        run_rest_sync(spark, table=table, spec=spec, stream="s-col")
        assert table.refresh().read().count() == 3

        del up.records[1]  # collaborator removed upstream
        table = table.refresh()
        m = run_rest_sync(spark, table=table, spec=spec, stream="s-col")
        assert m["deleted"] == 1
        assert ({r["id"] for r in table.refresh().read().collect()}
                == {1, 3})
    finally:
        up.stop()


def test_run_rest_sync_full_table_soft_delete_no_retombstone(spark, tmp_path):
    """On a soft-delete table, FULL_TABLE reconcile must compare the
    fetch against LIVE rows only: tombstones stay visible in read(), so
    without the IS NULL filter every sync re-emits D ops for all
    historically-deleted keys at a fresh LSN (re-tombstoning them,
    growing bucket rewrites with all-time deletes)."""
    from pyspark.sql import types as T

    from pipelinewise_spark.lake.table import LakeTable
    from pipelinewise_spark.sources.rest import run_rest_sync

    up = _MutableUpstream()
    try:
        up.records = [{"id": i, "updated_at": None, "val": f"v{i}"}
                      for i in (1, 2, 3)]
        schema = T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("updated_at", T.StringType()),
            T.StructField("val", T.StringType()),
        ])
        table = LakeTable.create(spark, str(tmp_path / "t"), schema,
                                 ["id"], num_buckets=4,
                                 properties={"soft_delete": True})
        spec = {"kwargs": {
            "stream": "s-soft", "base_url": up.url, "path": "/items",
            "records_path": "", "pagination": "none",
        }}
        run_rest_sync(spark, table=table, spec=spec, stream="s-soft")
        del up.records[1]  # id=2 vanishes upstream
        table = table.refresh()
        m = run_rest_sync(spark, table=table, spec=spec, stream="s-soft")
        assert m["tombstoned"] == 1
        tomb = {r["id"]: r["_lsn"]
                for r in table.refresh().read().where(
                    "_sdc_deleted_at IS NOT NULL").collect()}
        assert set(tomb) == {2}
        # the third sync sees an unchanged upstream: the already-
        # tombstoned key must NOT be re-deleted at a fresh LSN
        m = run_rest_sync(spark, table=table.refresh(), spec=spec,
                          stream="s-soft")
        assert m["tombstoned"] == 0 and m["deleted"] == 0
        tomb_after = {r["id"]: r["_lsn"]
                      for r in table.refresh().read().where(
                          "_sdc_deleted_at IS NOT NULL").collect()}
        assert tomb_after == tomb  # same tombstone, same lsn
    finally:
        up.stop()


def test_run_rest_sync_schema_drift_adds_columns(spark, tmp_path):
    """S17 for the SaaS family: a field that appears upstream mid-stream
    is ADD-COLUMNed before the merge (historical rows read NULL); with
    drift off the stored schema is strict and the field is dropped; a
    field colliding with the engine's merge columns raises loudly."""
    from pyspark.sql import types as T

    from pipelinewise_spark.lake.table import LakeTable
    from pipelinewise_spark.sources.rest import run_rest_sync

    up = _MutableUpstream()
    try:
        up.records = [
            {"id": 1, "updated_at": "2026-01-01T00:00:00Z", "val": "a"},
        ]
        schema = T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("updated_at", T.StringType()),
            T.StructField("val", T.StringType()),
        ])
        table = LakeTable.create(spark, str(tmp_path / "t"), schema,
                                 ["id"], num_buckets=4)
        spec = {"kwargs": {
            "stream": "s", "base_url": up.url, "path": "/items",
            "records_path": "", "pagination": "none",
            "replication_key": "updated_at", "since_param": "since",
        }}
        run_rest_sync(spark, table=table, spec=spec, stream="s")

        # upstream adds a field; the next window carries it
        up.records.append({"id": 2, "updated_at": "2026-01-02T00:00:00Z",
                           "val": "b", "labels": "bug,p1"})
        table = table.refresh()
        run_rest_sync(spark, table=table, spec=spec, stream="s")
        table = table.refresh()
        rows = {r["id"]: r["labels"] for r in table.read().collect()}
        assert rows == {1: None, 2: "bug,p1"}  # historical row reads NULL

        # drift OFF: a further new field is dropped, schema unchanged
        up.records.append({"id": 3, "updated_at": "2026-01-03T00:00:00Z",
                           "val": "c", "rogue": True})
        run_rest_sync(spark, table=table, spec=spec, stream="s",
                      schema_drift=False)
        table = table.refresh()
        assert "rogue" not in table.read().columns
        assert table.read().count() == 3

        # a reserved-name field must fail loudly, not corrupt the merge
        up.records.append({"id": 4, "updated_at": "2026-01-04T00:00:00Z",
                           "val": "d", "op": "x"})
        with pytest.raises(ValueError, match="collide"):
            run_rest_sync(spark, table=table, spec=spec, stream="s")
    finally:
        up.stop()


def test_fetch_pages_distributed_bad_records_path_is_loud(spark, api):
    """The executor path keeps the sequential loop's loud contract: a
    typo'd records_path must raise, not read as zero records forever."""
    df = fetch_pages_distributed(
        spark, api, "/paged", n_pages=2, records_path="wrong.place",
        schema="id bigint",
    )
    with pytest.raises(Exception, match="records_path"):
        df.collect()


def test_cli_test_tap_connection_rest_probe(api, tmp_path, capsys):
    """test_tap_connection probes the REST base_url host (the endpoint
    IS in the YAML) instead of reporting 'no endpoint in YAML'."""
    from jobs.cli import main as cli_main

    yml = tmp_path / "tap_rest.yml"
    yml.write_text(f"""
id: saas
type: tap-rest
db_conn: {{base_url: {api}}}
schemas:
  - source_schema: s
    tables:
      - {{table_name: items, path: /paged, pagination: page}}
""")
    assert cli_main(["test_tap_connection", "--project", str(yml)]) == 0
    out = capsys.readouterr().out
    assert "ok" in out and "tcp 127.0.0.1" in out

    bad = tmp_path / "tap_bad.yml"
    bad.write_text(yml.read_text().replace(api, "http://127.0.0.1:1"))
    assert cli_main(["test_tap_connection", "--project", str(bad),
                     "--timeout", "0.3"]) == 1


def test_reader_spec_rest():
    from pipelinewise_spark.config import reader_spec

    cfg = {"type": "tap-github", "db_conn": {}}
    table = {"table_name": "issues", "replication_method": "INCREMENTAL",
             "replication_key": "updated_at",
             "path": "/repos/o/r/issues", "since_param": "since"}
    spec = reader_spec(cfg, "gh", table)
    assert spec["module"] == "rest"
    assert spec["function"] == "rest_reader"
    assert spec["kwargs"]["base_url"] == "https://api.github.com"
    assert spec["kwargs"]["path"] == "/repos/o/r/issues"
    assert spec["required_at_bind"] == ["auth", "bookmark"]

    # subdomain-scoped API with no base_url fails at spec render
    with pytest.raises(ValueError, match="base_url"):
        reader_spec({"type": "tap-zendesk", "db_conn": {}}, "zd",
                    {"table_name": "tickets"})
