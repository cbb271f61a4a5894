"""Failure alerting: AlertSender + slack/victorops/webhook handlers
(reference ``cli/alert_sender.py``, ``cli/alert_handlers/*``) against a
real local HTTP server, and the run_cdc '<tap_id> tap failed' wiring."""

from __future__ import annotations

import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pipelinewise_spark import alerts
from pipelinewise_spark.alerts import (
    AlertSender,
    InvalidAlertHandlerError,
    NotImplementedAlertHandlerError,
    SlackAlertHandler,
    VictoropsAlertHandler,
)


class _Capture(BaseHTTPRequestHandler):
    requests: list[dict] = []

    def do_POST(self):
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        type(self).requests.append({
            "path": self.path,
            "auth": self.headers.get("Authorization"),
            "body": json.loads(body),
        })
        status = 500 if self.path.startswith("/fail") else 200
        if self.path.startswith("/notok"):
            # Slack's signature failure mode: HTTP 200, ok:false in body
            payload = json.dumps(
                {"ok": False, "error": "channel_not_found"}
            ).encode()
        else:
            payload = json.dumps({"ok": status == 200}).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def http_capture():
    _Capture.requests = []
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Capture)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}", _Capture.requests
    finally:
        srv.shutdown()


def test_slack_handler_payload_and_tap_channel(http_capture):
    url, reqs = http_capture
    h = SlackAlertHandler(
        {"token": "xoxb-1", "channel": "#ops", "api_url": f"{url}/slack"}
    )
    h.send("my_tap tap failed", exc=RuntimeError("boom"),
           tap_slack_channel="#my-tap")
    assert len(reqs) == 2  # default channel + per-tap channel
    assert {r["body"]["channel"] for r in reqs} == {"#ops", "#my-tap"}
    for r in reqs:
        assert r["auth"] == "Bearer xoxb-1"
        assert r["body"]["text"] == "```boom```"
        att = r["body"]["attachments"][0]
        assert att == {"color": "danger", "title": "my_tap tap failed"}


def test_slack_ok_false_raises(http_capture):
    """Slack answers HTTP 200 with {"ok": false, "error": ...} on a bad
    token/channel; a handler that only checks the status code reports
    the alert as sent while Slack silently dropped it (the reference's
    slack SDK raises SlackApiError on ok:false)."""
    url, reqs = http_capture
    h = SlackAlertHandler(
        {"token": "xoxb-1", "channel": "#gone", "api_url": f"{url}/notok"}
    )
    with pytest.raises(ValueError, match="channel_not_found"):
        h.send("my_tap tap failed")
    assert len(reqs) == 1  # the POST happened; the failure came from ok


def test_victorops_payload_and_non200(http_capture):
    url, reqs = http_capture
    h = VictoropsAlertHandler({"base_url": url, "routing_key": "db-team"})
    h.send("t tap failed", exc=ValueError("nope"))
    assert reqs[-1]["path"] == "/db-team"
    assert reqs[-1]["body"] == {
        "message_type": "CRITICAL",
        "entity_display_name": "t tap failed",
        "state_message": "nope",
    }
    bad = VictoropsAlertHandler(
        {"base_url": f"{url}/fail", "routing_key": "x"}
    )
    with pytest.raises(ValueError, match="victorops returned an error 500"):
        bad.send("t tap failed")


def test_sender_validates_at_construction():
    with pytest.raises(InvalidAlertHandlerError, match="dictionary"):
        AlertSender(["slack"])
    with pytest.raises(NotImplementedAlertHandlerError, match="rollbar"):
        AlertSender({"rollbar": {"token": "x"}})
    with pytest.raises(InvalidAlertHandlerError, match="token"):
        AlertSender({"slack": {"channel": "#ops"}})
    with pytest.raises(InvalidAlertHandlerError, match="routing key"):
        AlertSender({"victorops": {"base_url": "http://x"}})
    with pytest.raises(InvalidAlertHandlerError, match="url"):
        AlertSender({"webhook": {}})
    assert AlertSender(None).handlers == {}


def test_send_to_all_handlers_counts_and_isolates_failures(http_capture, capsys):
    url, reqs = http_capture
    sender = AlertSender({
        "webhook": {"url": f"{url}/hook"},
        "victorops": {"base_url": f"{url}/fail", "routing_key": "x"},
    })
    res = sender.send_to_all_handlers("t tap failed", exc=RuntimeError("e"))
    assert res == {"sent": 1, "failed": 1}
    assert "victorops" in capsys.readouterr().err
    ok = [r for r in reqs if r["path"] == "/hook"]
    assert ok[0]["body"] == {"message": "t tap failed", "level": "error",
                             "exc": "e"}


def test_schema_rejects_unknown_alert_handler():
    from pipelinewise_spark.project_schema import TAP_SCHEMA, validate_config

    cfg = {
        "id": "t", "type": "tap-mysql",
        "schemas": [{"source_schema": "s", "tables": [
            {"table_name": "x", "replication_method": "FULL_TABLE"}]}],
        "alert_handlers": {"rollbar": {"token": "x"}},
    }
    errs = validate_config(cfg, TAP_SCHEMA)
    assert errs and any("rollbar" in e or "additional" in e.lower()
                        for e in errs)


def test_run_cdc_failure_fires_tap_failed_alert(spark, tmp_path, http_capture):
    """End-to-end: project-mode run whose stream phase fails posts
    '<tap_id> tap failed' to the configured webhook and re-raises."""
    url, reqs = http_capture
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_project_config import TAP_YAML

    from jobs.run_cdc import main as run_cdc_main

    proj = tmp_path / "tap.yml"
    proj.write_text(
        TAP_YAML + f"\nalert_handlers:\n  webhook:\n    url: {url}/hook\n"
    )
    with pytest.raises(Exception):
        run_cdc_main([
            "--project", str(proj), "--table", str(tmp_path / "lake"),
            "--events", str(tmp_path / "does-not-exist"),
            "--checkpoint", str(tmp_path / "ck"),
        ])
    hooks = [r for r in reqs if r["path"] == "/hook"]
    assert len(hooks) == 1
    assert hooks[0]["body"]["message"] == "mysql_sample tap failed"
    assert hooks[0]["body"]["level"] == "error"
    assert hooks[0]["body"]["exc"]


def test_send_alert_false_opts_out(spark, tmp_path, http_capture):
    url, reqs = http_capture
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_project_config import TAP_YAML

    from jobs.run_cdc import main as run_cdc_main

    proj = tmp_path / "tap.yml"
    proj.write_text(
        TAP_YAML
        + f"\nsend_alert: false\nalert_handlers:\n  webhook:\n"
          f"    url: {url}/hook\n"
    )
    with pytest.raises(Exception):
        run_cdc_main([
            "--project", str(proj), "--table", str(tmp_path / "lake"),
            "--events", str(tmp_path / "does-not-exist"),
            "--checkpoint", str(tmp_path / "ck"),
        ])
    assert not [r for r in reqs if r["path"] == "/hook"]
