"""Google Sheets REST v4 connector (stdlib-only alternative backend
for SURVEY.md §2.1 S3/S8).

The gspread path (io/gsheets.py) is import-gated because gspread isn't
installed everywhere; this module speaks the public Sheets REST v4
shapes (GET values, PUT values, :batchUpdate addSheet/deleteSheet)
directly over urllib, so the S3 fetch and S8 sheet-rebuild sink run
with no third-party dependency — and tests can point ``base_url`` at a
local HTTP fixture to exercise the real request/response/chunking path
instead of mocking the client (tests/test_sheets_rest.py).

Endpoint shapes per the public API reference
(https://developers.google.com/sheets/api/reference/rest):

- GET  {base}/v4/spreadsheets/{id}                       (metadata)
- GET  {base}/v4/spreadsheets/{id}/values/{range}        (read)
- PUT  {base}/v4/spreadsheets/{id}/values/{range}?valueInputOption=RAW
- POST {base}/v4/spreadsheets/{id}:batchUpdate           (add/del sheet)

Reference parity: fetch/push mirror main.py:113-160 / main.py:300-349
semantics (S8 implemented with the intended behavior — the reference's
version is dead code, see SURVEY §7.3).
"""

from __future__ import annotations

import json
import os
import urllib.parse
import urllib.request

from pyspark.sql import DataFrame, SparkSession

GOOGLE_BASE_URL = "https://sheets.googleapis.com"
# Sheets API caps title length; the reference truncates to 99
# (main.py:151) — keep the same bound for parity.
MAX_SHEET_TITLE = 99
# Rows per values-update request. The public API limits request
# payload size (2 MB); chunking also bounds memory per request.
UPDATE_CHUNK_ROWS = 1000


def _quote_title(title: str) -> str:
    """A1-notation sheet prefix: quote the title, double any embedded
    single quotes ('It''s'!A1)."""
    return "'" + title.replace("'", "''") + "'"


class SheetsRestClient:
    """Thin stateless client. ``token`` becomes an Authorization:
    Bearer header (OAuth/service-account flows mint these); ``api_key``
    becomes the ?key= query param (read-only public sheets). Both are
    optional so a local test fixture needs neither."""

    def __init__(self, base_url: str = GOOGLE_BASE_URL,
                 token: str | None = None, api_key: str | None = None,
                 timeout: float = 30.0):
        self.base_url = base_url.rstrip("/")
        self.token = token
        self.api_key = api_key
        self.timeout = timeout

    # -- transport ---------------------------------------------------

    def _request(self, method: str, path: str,
                 params: dict[str, str] | None = None,
                 body: dict | None = None) -> dict:
        qs = dict(params or {})
        if self.api_key:
            qs["key"] = self.api_key
        url = self.base_url + path
        if qs:
            url += "?" + urllib.parse.urlencode(qs)
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(url, data=data, method=method)
        req.add_header("Accept", "application/json")
        if data is not None:
            req.add_header("Content-Type", "application/json")
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            payload = resp.read()
        return json.loads(payload) if payload else {}

    # -- reads -------------------------------------------------------

    def spreadsheet_meta(self, spreadsheet_id: str) -> dict:
        return self._request("GET", f"/v4/spreadsheets/{spreadsheet_id}")

    def sheet_id_by_title(self, spreadsheet_id: str,
                          title: str) -> int | None:
        for s in self.spreadsheet_meta(spreadsheet_id).get("sheets", []):
            props = s.get("properties", {})
            if props.get("title") == title:
                return props.get("sheetId")
        return None

    def get_values(self, spreadsheet_id: str, title: str,
                   cell_range: str | None = None) -> list[list[str]]:
        rng = _quote_title(title)
        if cell_range:
            rng += f"!{cell_range}"
        out = self._request(
            "GET",
            f"/v4/spreadsheets/{spreadsheet_id}/values/"
            + urllib.parse.quote(rng, safe=""))
        return out.get("values", [])

    # -- writes ------------------------------------------------------

    def update_values(self, spreadsheet_id: str, title: str,
                      values: list[list],
                      chunk_rows: int = UPDATE_CHUNK_ROWS) -> int:
        """Write rows starting at A1, chunked into multiple PUT
        requests of ``chunk_rows`` each (payload-size cap). Returns the
        number of requests issued."""
        n_req = 0
        for start in range(0, len(values), chunk_rows):
            chunk = values[start:start + chunk_rows]
            rng = f"{_quote_title(title)}!A{start + 1}"
            self._request(
                "PUT",
                f"/v4/spreadsheets/{spreadsheet_id}/values/"
                + urllib.parse.quote(rng, safe=""),
                params={"valueInputOption": "RAW"},
                body={"range": rng, "majorDimension": "ROWS",
                      "values": chunk})
            n_req += 1
        return n_req

    def add_sheet(self, spreadsheet_id: str, title: str,
                  rows: int, cols: int) -> None:
        self._request(
            "POST", f"/v4/spreadsheets/{spreadsheet_id}:batchUpdate",
            body={"requests": [{"addSheet": {"properties": {
                "title": title,
                "gridProperties": {"rowCount": rows,
                                   "columnCount": cols}}}}]})

    def delete_sheet(self, spreadsheet_id: str, sheet_id: int) -> None:
        self._request(
            "POST", f"/v4/spreadsheets/{spreadsheet_id}:batchUpdate",
            body={"requests": [{"deleteSheet": {"sheetId": sheet_id}}]})


# -- S3: metadata fetch ---------------------------------------------------

def fetch_metadata_via_rest(spark: SparkSession, client: SheetsRestClient,
                            spreadsheet_id: str, cache_dir: str,
                            repdata_cols: list[str]) -> dict[str, DataFrame]:
    """S3 over REST: pull STM + RELIGIONS + one worksheet per
    repeated-data column (first row = header), snapshot each to the CSV
    cache (S2's input), return small all-string DataFrames. Driver-side
    by design — these are per-column control tables, not data
    (reference main.py:113-160)."""
    import csv

    os.makedirs(cache_dir, exist_ok=True)
    out: dict[str, DataFrame] = {}
    for ws in ["STM", "RELIGIONS"] + [c[:MAX_SHEET_TITLE]
                                      for c in repdata_cols]:
        values = client.get_values(spreadsheet_id, ws)
        if not values or len(values) < 2:
            continue
        header, rows = values[0], values[1:]
        # Ragged rows (Sheets drops trailing blanks): right-pad.
        rows = [r + [""] * (len(header) - len(r)) for r in rows]
        with open(os.path.join(cache_dir, f"{ws}.csv"), "w",
                  newline="") as fh:
            w = csv.writer(fh)
            w.writerow(header)
            w.writerows(rows)
        out[ws] = spark.createDataFrame(
            [[str(c) for c in r] for r in rows],
            schema=[str(h) for h in header])
    return out


# -- S8: repeated-data sheet rebuild --------------------------------------

def push_repeated_data_sheets_rest(df: DataFrame, columns: list[str],
                                   key_col: str, client: SheetsRestClient,
                                   spreadsheet_id: str) -> dict[str, int]:
    """S8 over REST (intended semantics of the reference's dead sink,
    main.py:300-349): per repeated-data column, rebuild a worksheet
    with (key, value, length) sorted longest-first. The collect() is
    bounded — only one column's non-blank (key, value) pairs travel to
    the driver. Values are written in UPDATE_CHUNK_ROWS chunks; returns
    {column: requests_issued} so callers can log the fan-out."""
    from pyspark.sql import functions as F

    issued: dict[str, int] = {}
    for col in columns:
        rows = (df.select(key_col, col)
                .where(F.col(col).isNotNull() & (F.col(col) != ""))
                .withColumn("length", F.length(col))
                .orderBy(F.desc("length"), key_col)
                .collect())
        title = col[:MAX_SHEET_TITLE]
        old = client.sheet_id_by_title(spreadsheet_id, title)
        if old is not None:
            client.delete_sheet(spreadsheet_id, old)
        client.add_sheet(spreadsheet_id, title,
                         rows=len(rows) + 1, cols=3)
        values = [[key_col, col, "length"]] + [
            [r[key_col], r[col], r["length"]] for r in rows]
        issued[col] = client.update_values(spreadsheet_id, title, values)
    return issued
