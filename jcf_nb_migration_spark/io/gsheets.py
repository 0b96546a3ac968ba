"""Google Sheets control-plane connector (SURVEY.md §2.1 S3/S8).

The reference pulls its STM/RELIGIONS/repeated-data worksheets via
gspread + OAuth2 (main.py:113-160) and has a (dead) sheet-rebuild sink
(main.py:300-349). Spark has no Sheets connector; the correct shape is
driver-side fetch → spark.createDataFrame → CSV/parquet snapshot cache,
which is exactly what the reference's --meta path does (README:41).

gspread isn't installed in this environment, so the network calls are
import-gated: everything degrades to the local snapshot cache
(load_metadata_from_cache), which is also the fast path the reference
uses on every non---meta run. io/sheets_rest.py provides a
dependency-free alternative backend (public Sheets REST v4 over
urllib) with the same S3/S8 semantics, live-tested against a local
HTTP fixture (tests/test_sheets_rest.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from jcf_nb_migration_spark.io.readers import read_csv

try:  # pragma: no cover - not installed in this environment
    import gspread  # type: ignore
    from oauth2client.service_account import (  # type: ignore
        ServiceAccountCredentials,
    )
    HAVE_GSPREAD = True
except ImportError:
    HAVE_GSPREAD = False

OAUTH_SCOPE = ("https://spreadsheets.google.com/feeds",
               "https://www.googleapis.com/auth/drive")
MAX_SHEET_TITLE = 99  # Sheets API cap the reference truncates to (main.py:151)


def fetch_metadata_from_gsheet(spark: SparkSession, api_key_file: str,
                               spreadsheet: str, cache_dir: str,
                               repdata_cols: list[str]) -> dict[str, DataFrame]:
    """S3: pull STM + RELIGIONS + one worksheet per repeated-data
    column; snapshot every table to the CSV cache so later runs use
    load_metadata_from_cache. Driver-side by design: these are
    per-column control tables, not data."""
    if not HAVE_GSPREAD:
        raise NotImplementedError(
            "gspread/oauth2client not installed; run from the snapshot "
            "cache via load_metadata_from_cache instead")
    creds = ServiceAccountCredentials.from_json_keyfile_name(
        api_key_file, OAUTH_SCOPE)
    client = gspread.authorize(creds)
    book = client.open(spreadsheet)
    os.makedirs(cache_dir, exist_ok=True)
    out: dict[str, DataFrame] = {}
    for ws_name in ["STM", "RELIGIONS"] + [
            c[:MAX_SHEET_TITLE] for c in repdata_cols]:
        records = book.worksheet(ws_name).get_all_records()
        df = spark.createDataFrame(records) if records else None
        if df is not None:
            df.toPandas().to_csv(
                os.path.join(cache_dir, f"{ws_name}.csv"), index=False)
            out[ws_name] = df
    return out


def load_metadata_from_cache(spark: SparkSession,
                             cache_dir: str) -> dict[str, DataFrame]:
    """S2: the snapshot-cache path (reference loadMetaDataFromTempFile,
    main.py:163-180) — every CSV in the cache dir becomes a small
    all-string DataFrame keyed by worksheet name."""
    out: dict[str, DataFrame] = {}
    for fn in sorted(os.listdir(cache_dir)):
        if fn.endswith(".csv"):
            out[fn[:-4]] = read_csv(
                spark, os.path.join(cache_dir, fn), all_string=True)
    return out


def push_repeated_data_sheets(df: DataFrame, columns: list[str],
                              key_col: str, api_key_file: str,
                              spreadsheet: str) -> None:
    """S8 (intended semantics — the reference version is dead code with
    a config-typo crash, SURVEY §7.3): rebuild one worksheet per
    repeated-data column with (key, value, length) sorted longest
    first. The collect() is bounded: only repeated (key, value) pairs
    of a single column travel to the driver."""
    if not HAVE_GSPREAD:
        raise NotImplementedError(
            "gspread/oauth2client not installed; sheet sink unavailable")
    from pyspark.sql import functions as F

    creds = ServiceAccountCredentials.from_json_keyfile_name(
        api_key_file, OAUTH_SCOPE)
    client = gspread.authorize(creds)
    book = client.open(spreadsheet)
    for col in columns:
        rows = (df.select(key_col, col)
                .where(F.col(col).isNotNull() & (F.col(col) != ""))
                .withColumn("length", F.length(col))
                .orderBy(F.desc("length"))
                .collect())
        title = col[:MAX_SHEET_TITLE]
        try:
            book.del_worksheet(book.worksheet(title))
        except Exception:
            pass
        ws = book.add_worksheet(title=title, rows=len(rows) + 1, cols=3)
        ws.update([[key_col, col, "length"]]
                  + [[r[key_col], r[col], r["length"]] for r in rows])


def setup_workspace(output_dir: str, api_key_file: str | None = None,
                    cache_dir: str | None = None) -> list[str]:
    """S10 lifecycle (reference setup(), main.py:73-110): verify the
    API key exists (when Sheets access is wanted), atomically recreate
    the distinct-values output dir, and warn when the metadata cache is
    missing. Returns warnings instead of printing."""
    import shutil
    import tempfile

    warnings: list[str] = []
    if api_key_file is not None and not os.path.exists(api_key_file):
        warnings.append(f"API key file not found: {api_key_file}")
    if os.path.exists(output_dir):
        tmp = tempfile.mkdtemp(prefix="jcf_setup_")
        trash = os.path.join(tmp, "old_output")
        shutil.move(output_dir, trash)
        shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(output_dir, exist_ok=True)
    if cache_dir is not None and not os.path.isdir(cache_dir):
        warnings.append(
            f"metadata cache missing: {cache_dir} (run the gsheet fetch)")
    return warnings
