"""ES bulk shipping transport (round-12 verdict task 3): the
round-12 arm rendered the exact ``_bulk`` NDJSON; this round ships
it — a stdlib-urllib POST loop with bounded 429/5xx retry and a
persisted ``since=`` cursor, scheduled-verb discipline like
``serve_prometheus``. Stub-HTTP-server tests in the
``test_rest_oauth.py`` style: success + cursor advance, incremental
re-ship with boundary overlap on the same ``_id``, 429 retry-then-
success, exhausted retries leaving the cursor untouched, and a
partial-failure bulk response refusing to advance."""

from __future__ import annotations

import datetime as dt
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from ods_v3_dbt_spark.esexport import ship_es_bulk
from ods_v3_dbt_spark.metrics import MetricsLog
from ods_v3_dbt_spark.runlog import RunLog, RunRecord

T0 = dt.datetime(2024, 3, 1, 10, 0, 0)


class _EsStub(BaseHTTPRequestHandler):
    state = None  # injected: {"requests": [], "fail_codes": [...], "errors_response": bool}

    def log_message(self, *a):
        pass

    def do_POST(self):
        st = self.state
        assert self.path == "/_bulk"
        length = int(self.headers["Content-Length"])
        body = self.rfile.read(length).decode()
        st["requests"].append(
            {"body": body,
             "content_type": self.headers["Content-Type"]}
        )
        if st["fail_codes"]:
            code = st["fail_codes"].pop(0)
            self.send_response(code)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        docs = [json.loads(x) for x in body.strip().split("\n")]
        actions = docs[0::2]
        if st.get("errors_response"):
            items = [
                {"index": {"_id": a["index"]["_id"], "status": 500}}
                for a in actions
            ]
            resp = {"errors": True, "items": items}
        else:
            items = [
                {"index": {"_id": a["index"]["_id"], "status": 201}}
                for a in actions
            ]
            resp = {"errors": False, "items": items}
        out = json.dumps(resp).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)


@pytest.fixture()
def es_stub():
    state = {"requests": [], "fail_codes": [], "errors_response": False}
    handler = type("H", (_EsStub,), {"state": state})
    srv = HTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        yield state, f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()


def _fixture_logs(spark, tmp_path):
    rl = RunLog(tmp_path / "runs")
    rl.append(spark, RunRecord("jobA", "t1", "20240301", T0, 1.5,
                               "ok", True))
    rl.append(spark, RunRecord("jobA", "t2", "20240301",
                               T0 + dt.timedelta(minutes=5), 2.0,
                               "ok", True))
    ml = MetricsLog(tmp_path / "metrics")
    ml.emit(spark, "jobA", "t1", "extract", {"rows_out": (10, "rows")})
    return rl, ml


def test_ship_success_and_cursor_advance(spark, tmp_path, es_stub):
    state, endpoint = es_stub
    rl, ml = _fixture_logs(spark, tmp_path)
    cursor = tmp_path / "es_cursor.json"

    rep = ship_es_bulk(spark, endpoint, run_log=rl, metrics_log=ml,
                       cursor_path=cursor)
    assert rep["shipped_docs"] == 3
    assert rep["runlog_docs"] == 2 and rep["metrics_docs"] == 1
    assert rep["attempts"] == 1
    (req,) = state["requests"]
    assert req["content_type"] == "application/x-ndjson"
    lines = req["body"].strip().split("\n")
    assert len(lines) == 6 and req["body"].endswith("\n")
    actions, sources = lines[0::2], lines[1::2]
    # logstash date-suffixed indexes (suffix = each record's own
    # event date — the runlog rows are pinned at T0; the metric row
    # is stamped at emit time) + deterministic ids
    for a, s in zip(actions, sources):
        ix = json.loads(a)["index"]
        day = json.loads(s)["@timestamp"][:10].replace("-", ".")
        assert ix["_index"].endswith(f"-{day}")
        assert len(ix["_id"]) == 32
    runlog_actions = [
        a for a, s in zip(actions, sources)
        if json.loads(s)["tag"] == "ods.runlog"
    ]
    assert all(
        json.loads(a)["index"]["_index"] == "ods-run-log-2024.03.01"
        for a in runlog_actions
    )
    assert {json.loads(s)["tag"] for s in sources} == {
        "ods.runlog", "ods.metrics"
    }
    # cursor persisted at each arm's max shipped @timestamp
    cur = json.loads(cursor.read_text())
    assert cur["runlog"].startswith("2024-03-01T10:05:00")
    assert "metrics" in cur

    # immediate re-ship: only the boundary rows (inclusive >= window)
    # go out again, onto the SAME _ids — overwrite, never duplicate
    rep2 = ship_es_bulk(spark, endpoint, run_log=rl, metrics_log=ml,
                        cursor_path=cursor)
    assert rep2["runlog_docs"] == 1  # the t2 boundary row only
    boundary = state["requests"][1]["body"].strip().split("\n")
    assert json.loads(boundary[0])["index"]["_id"] in {
        json.loads(a)["index"]["_id"] for a in actions
    }

    # a genuinely new row ships incrementally
    rl.append(spark, RunRecord("jobA", "t3", "20240301",
                               T0 + dt.timedelta(minutes=30), 1.0,
                               "ok", True))
    rep3 = ship_es_bulk(spark, endpoint, run_log=rl, cursor_path=cursor)
    assert rep3["runlog_docs"] == 2  # boundary + the new t3 row
    assert json.loads(
        cursor.read_text()
    )["runlog"].startswith("2024-03-01T10:30:00")


def test_ship_retries_on_429_then_succeeds(spark, tmp_path, es_stub):
    state, endpoint = es_stub
    rl, _ = _fixture_logs(spark, tmp_path)
    state["fail_codes"] = [429, 429]
    rep = ship_es_bulk(spark, endpoint, run_log=rl,
                       cursor_path=tmp_path / "cur.json",
                       retries=3, backoff_s=0.01)
    assert rep["attempts"] == 3
    assert rep["shipped_docs"] == 2
    assert len(state["requests"]) == 3  # two throttled + one landed


def test_ship_exhausted_retries_leave_cursor_untouched(
    spark, tmp_path, es_stub
):
    import urllib.error

    state, endpoint = es_stub
    rl, _ = _fixture_logs(spark, tmp_path)
    cursor = tmp_path / "cur.json"
    state["fail_codes"] = [500, 500, 500]
    with pytest.raises(urllib.error.HTTPError):
        ship_es_bulk(spark, endpoint, run_log=rl, cursor_path=cursor,
                     retries=2, backoff_s=0.01)
    assert not cursor.exists()  # replay re-ships the whole window
    # 400-class errors are NOT retried (a malformed payload never
    # fixes itself)
    state["fail_codes"] = [400]
    with pytest.raises(urllib.error.HTTPError):
        ship_es_bulk(spark, endpoint, run_log=rl, cursor_path=cursor,
                     retries=3, backoff_s=0.01)
    assert len(state["requests"]) == 4  # 3 retried 500s + single 400


def test_ship_partial_index_errors_refuse_cursor(spark, tmp_path, es_stub):
    state, endpoint = es_stub
    rl, _ = _fixture_logs(spark, tmp_path)
    cursor = tmp_path / "cur.json"
    state["errors_response"] = True
    with pytest.raises(RuntimeError, match="cursor NOT advanced"):
        ship_es_bulk(spark, endpoint, run_log=rl, cursor_path=cursor)
    assert not cursor.exists()


def test_ship_empty_window_skips_post(spark, tmp_path, es_stub):
    state, endpoint = es_stub
    rep = ship_es_bulk(
        spark, endpoint,
        run_log=RunLog(tmp_path / "never_written"),
        metrics_log=MetricsLog(tmp_path / "also_never"),
        cursor_path=tmp_path / "cur.json",
    )
    assert rep["shipped_docs"] == 0 and rep["attempts"] == 0
    assert state["requests"] == []
