"""S3/S8 over a live local HTTP fixture: a real http.server speaking
the Sheets REST v4 response shapes, so the connector's actual request
path — URL/range encoding, auth headers, JSON bodies, batch-update
chunking — is exercised end to end with zero mocks (the r3 gap: the
gspread path could only be mock-tested because gspread isn't
installed)."""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from jcf_nb_migration_spark.io.sheets_rest import (
    SheetsRestClient,
    fetch_metadata_via_rest,
    push_repeated_data_sheets_rest,
)


class _FakeSheetsState:
    """In-memory spreadsheet: {title: {"sheetId": int, "values": [..]}}"""

    def __init__(self, sheets=None):
        self.sheets = sheets or {}
        self.next_id = 100
        self.log = []  # (method, path, body) per request


class _Handler(BaseHTTPRequestHandler):
    state: _FakeSheetsState  # set per-server

    def log_message(self, *a):  # silence
        pass

    def _reply(self, obj, code=200):
        payload = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def _read_body(self):
        n = int(self.headers.get("Content-Length", 0))
        return json.loads(self.rfile.read(n)) if n else None

    def _title_from_range(self, quoted_range):
        rng = urllib.parse.unquote(quoted_range)
        title = rng.split("!")[0]
        if title.startswith("'"):
            title = title[1:-1].replace("''", "'")
        return title, rng

    def do_GET(self):
        st = self.state
        path = urllib.parse.urlparse(self.path).path
        st.log.append(("GET", path, None))
        parts = path.split("/")
        # /v4/spreadsheets/{id}/values/{range}
        if len(parts) >= 6 and parts[4] == "values":
            title, _ = self._title_from_range(parts[5])
            sheet = st.sheets.get(title)
            if sheet is None:
                return self._reply({"error": {"code": 400}}, 400)
            return self._reply({"range": title, "majorDimension": "ROWS",
                                "values": sheet["values"]})
        # /v4/spreadsheets/{id}
        if len(parts) == 4:
            return self._reply({"sheets": [
                {"properties": {"sheetId": s["sheetId"], "title": t}}
                for t, s in st.sheets.items()]})
        self._reply({"error": {"code": 404}}, 404)

    def do_PUT(self):
        st = self.state
        path = urllib.parse.urlparse(self.path).path
        body = self._read_body()
        st.log.append(("PUT", path, body))
        parts = path.split("/")
        assert parts[4] == "values"
        title, rng = self._title_from_range(parts[5])
        if title not in st.sheets:
            return self._reply({"error": {"code": 400}}, 400)
        # honor the A{row} offset so chunked writes land in place
        start_row = int(rng.split("!A")[1]) - 1
        vals = st.sheets[title]["values"]
        for i, row in enumerate(body["values"]):
            idx = start_row + i
            while len(vals) <= idx:
                vals.append([])
            vals[idx] = row
        self._reply({"updatedCells":
                     sum(len(r) for r in body["values"])})

    def do_POST(self):
        st = self.state
        path = urllib.parse.urlparse(self.path).path
        body = self._read_body()
        st.log.append(("POST", path, body))
        assert path.endswith(":batchUpdate")
        for req in body["requests"]:
            if "addSheet" in req:
                props = req["addSheet"]["properties"]
                st.sheets[props["title"]] = {"sheetId": st.next_id,
                                             "values": []}
                st.next_id += 1
            elif "deleteSheet" in req:
                sid = req["deleteSheet"]["sheetId"]
                st.sheets = {t: s for t, s in st.sheets.items()
                             if s["sheetId"] != sid}
        self._reply({"replies": [{} for _ in body["requests"]]})


@pytest.fixture()
def sheets_server():
    state = _FakeSheetsState()
    handler = type("H", (_Handler,), {"state": state})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}", state
    finally:
        srv.shutdown()


def test_s3_fetch_writes_cache_and_frames(spark, sheets_server, tmp_path):
    base, state = sheets_server
    state.sheets["STM"] = {"sheetId": 1, "values": [
        ["fullColName", "IN SCOPE", "NB TARGET FIELD"],
        ["Email", "T", "email"],
        ["Phone", "T"],                      # ragged row -> padded
    ]}
    state.sheets["RELIGIONS"] = {"sheetId": 2, "values": [
        ["Values in Data", "Replacement Values"],
        ["christian", "Christianity"],
    ]}
    client = SheetsRestClient(base_url=base, token="tok-123")
    out = fetch_metadata_via_rest(spark, client, "book1",
                                  str(tmp_path / "cache"), [])
    assert set(out) == {"STM", "RELIGIONS"}
    rows = {r["fullColName"]: r for r in out["STM"].collect()}
    assert rows["Phone"]["NB TARGET FIELD"] == ""   # padding applied
    # cache snapshot written (S2 input)
    cached = (tmp_path / "cache" / "STM.csv").read_text()
    assert cached.splitlines()[0] == "fullColName,IN SCOPE,NB TARGET FIELD"
    # real requests hit the live server with the ranges URL-encoded
    gets = [p for (m, p, _) in state.log if m == "GET"]
    assert any("/values/" in p and "STM" in urllib.parse.unquote(p)
               for p in gets)


def test_s8_push_rebuilds_sheets_and_chunks(spark, sheets_server):
    base, state = sheets_server
    # pre-existing stale sheet must be deleted before rebuild
    state.sheets["Interests"] = {"sheetId": 7,
                                 "values": [["old", "junk", "x"]]}
    df = spark.createDataFrame(
        [(f"u{i}@x", "v" * (i % 5 + 1)) for i in range(25)],
        "Email string, Interests string")
    client = SheetsRestClient(base_url=base)
    issued = push_repeated_data_sheets_rest(
        df, ["Interests"], "Email", client, "book1")

    # chunking: 26 rows (header + 25) at chunk_rows=1000 -> 1 request;
    # verify the chunk math separately below
    assert issued == {"Interests": 1}
    vals = state.sheets["Interests"]["values"]
    assert vals[0] == ["Email", "Interests", "length"]
    lengths = [r[2] for r in vals[1:]]
    assert lengths == sorted(lengths, reverse=True)   # longest first
    assert len(vals) == 26
    # stale sheet was deleted (new sheetId assigned by the server)
    assert state.sheets["Interests"]["sheetId"] >= 100
    posts = [b for (m, p, b) in state.log if m == "POST"]
    kinds = [next(iter(r)) for b in posts for r in b["requests"]]
    assert kinds == ["deleteSheet", "addSheet"]


def test_update_values_chunking_math(sheets_server):
    base, state = sheets_server
    state.sheets["Big"] = {"sheetId": 3, "values": []}
    client = SheetsRestClient(base_url=base)
    values = [[str(i)] for i in range(2500)]
    n_req = client.update_values("book1", "Big", values, chunk_rows=1000)
    assert n_req == 3
    # all rows landed, in order, across the 3 chunked PUTs
    got = [r[0] for r in state.sheets["Big"]["values"]]
    assert got == [str(i) for i in range(2500)]
    puts = [(p, b) for (m, p, b) in state.log if m == "PUT"]
    assert len(puts) == 3
    # offsets encode the chunk starts: A1, A1001, A2001
    offs = [urllib.parse.unquote(p.split("/values/")[1]).split("!")[1]
            for p, _ in puts]
    assert offs == ["A1", "A1001", "A2001"]


def test_quoted_title_roundtrip(sheets_server):
    base, state = sheets_server
    title = "It's a sheet"
    state.sheets[title] = {"sheetId": 4, "values": [["h"], ["v"]]}
    client = SheetsRestClient(base_url=base)
    assert client.get_values("book1", title) == [["h"], ["v"]]
    assert client.sheet_id_by_title("book1", title) == 4
