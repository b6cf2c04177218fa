"""S7 REST OAuth2 flow against a local stdlib http.server stub:
password-grant token acquisition, Bearer-authenticated paged GET,
mid-pagination expiry handled via the refresh grant, '' → NULL
normalization, and PII masking — the full contract of the
reference's HRM extract (``hrm_to_ods.py:56-66,86,133-157``) plus
the token lifecycle it hard-codes away."""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from ods_v3_dbt_spark.catalog import TableSpec
from ods_v3_dbt_spark.sources import readers

CLIENT = {
    "username": "hrmapi",
    "password": "pw",
    "grant_type": "password",
    "client_id": "cid",
    "client_secret": "sec",
}

PAGES = {
    1: [
        {"MaNV": "e1", "HoTen": "Alice", "Mobile": "111", "Luong": "10"},
        {"MaNV": "e2", "HoTen": "", "Mobile": "222", "Luong": "20"},
    ],
    2: [{"MaNV": "e3", "HoTen": "Carol", "Mobile": "", "Luong": "30"}],
}


class _Stub(BaseHTTPRequestHandler):
    """Tokens are one-shot: every /token grant issues tok-N and
    invalidates tok-(N-1), and the server expires the CURRENT token
    after `expire_after_uses` authorized data GETs — forcing the
    client through the refresh grant mid-pagination."""

    state = None  # injected dict

    def log_message(self, *a):  # quiet
        pass

    def _json(self, code, obj):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        st = self.state
        assert self.path == "/token"
        length = int(self.headers["Content-Length"])
        form = dict(urllib.parse.parse_qsl(self.rfile.read(length).decode()))
        st["grants"].append(form)
        gt = form.get("grant_type")
        if gt == "password":
            ok = (
                form.get("username") == CLIENT["username"]
                and form.get("password") == CLIENT["password"]
                and form.get("client_id") == CLIENT["client_id"]
                and form.get("client_secret") == CLIENT["client_secret"]
            )
        else:
            ok = gt == "refresh_token" and form.get("refresh_token") == st["refresh"]
        if not ok:
            return self._json(400, {"error": "invalid_grant"})
        st["issue"] += 1
        st["token"] = f"tok-{st['issue']}"
        st["refresh"] = f"ref-{st['issue']}"
        st["uses_left"] = st["expire_after_uses"]
        return self._json(
            200,
            {
                "access_token": st["token"],
                "refresh_token": st["refresh"],
                "expires_in": 3600,
                "token_type": "Bearer",
            },
        )

    def do_GET(self):
        st = self.state
        parsed = urllib.parse.urlparse(self.path)
        assert parsed.path == "/api/employees"
        authz = self.headers.get("Authorization", "")
        if authz != f"Bearer {st['token']}" or st["uses_left"] <= 0:
            return self._json(401, {"error": "invalid_token"})
        st["uses_left"] -= 1
        q = dict(urllib.parse.parse_qsl(parsed.query))
        page = int(q.get("page", "1"))
        st["pages_served"].append(page)
        return self._json(200, {"DATA": PAGES.get(page, [])})


@pytest.fixture()
def stub_server():
    state = {
        "issue": 0,
        "token": None,
        "refresh": None,
        "uses_left": 0,
        "expire_after_uses": 10**9,
        "grants": [],
        "pages_served": [],
    }
    _Stub.state = state
    srv = HTTPServer(("127.0.0.1", 0), _Stub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", state
    srv.shutdown()
    t.join(timeout=5)


SPEC = TableSpec(
    name="hrm_employee",
    schema_name="staging",
    columns={"emp_code": "string", "full_name": "string",
             "mobile": "string", "salary": "string"},
    src_columns={"MaNV": "emp_code", "HoTen": "full_name",
                 "Mobile": "mobile", "Luong": "salary"},
)


def test_oauth_paged_extract_with_mask(spark, stub_server):
    base, state = stub_server
    auth = readers.OAuth2Client(f"{base}/token", CLIENT)
    df = readers.rest_source_http(
        spark, f"{base}/api/employees", auth, SPEC, mask_cols=["mobile"]
    )
    rows = {r.emp_code: r for r in df.collect()}
    assert set(rows) == {"e1", "e2", "e3"}
    assert rows["e2"].full_name is None  # '' → NULL (reference :139)
    assert all(r.mobile is None for r in rows.values())  # PII masked
    assert rows["e3"].salary == "30"
    # one password grant, pages walked to the empty terminator
    assert [g["grant_type"] for g in state["grants"]] == ["password"]
    assert state["pages_served"] == [1, 2, 3]


def test_token_expiry_mid_pagination_uses_refresh_grant(spark, stub_server):
    base, state = stub_server
    state["expire_after_uses"] = 1  # token dies after one data GET
    auth = readers.OAuth2Client(f"{base}/token", CLIENT)
    rows = readers.fetch_rest_pages(f"{base}/api/employees", auth)
    assert len(rows) == 3  # no rows dropped across re-auth
    grant_types = [g["grant_type"] for g in state["grants"]]
    assert grant_types[0] == "password"
    assert "refresh_token" in grant_types  # renewal used refresh, not password
    # the refresh grant carried the server-issued refresh token
    refreshes = [g for g in state["grants"] if g["grant_type"] == "refresh_token"]
    assert all(g["refresh_token"].startswith("ref-") for g in refreshes)


def test_bad_credentials_fail_loud(stub_server):
    base, _ = stub_server
    auth = readers.OAuth2Client(f"{base}/token", {**CLIENT, "password": "wrong"})
    with pytest.raises(Exception):
        readers.fetch_rest_pages(f"{base}/api/employees", auth)
