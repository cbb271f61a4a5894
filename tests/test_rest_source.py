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
