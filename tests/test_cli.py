"""CLI entry-point parity test (reference ``python main.py
[--setup|--meta]``, main.py:16-39, 650-688): --help, --setup, and the
default cache-driven pipeline run on demo fixtures."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CRM_CSV = """Email,First Name,Join Date,Are you a person of faith?,Notes,Vol Interest,Phone A,Phone B
e1@x,Ann,2019-03-07,christian,fine,yes,111,111
e2@x,Bob,2020-01-02,jedi,this is a Test row,,1,2
e5@x,Eve,2018-06-15,,,,555,556
"""

STM_CSV = """fullColName,IN SCOPE,NB TARGET FIELD,Tag?,Tag Name,Custom Field Type?
Email,T,email,,,
First Name,T,first_name,,,
Join Date,T,join_date,,,
Are you a person of faith?,T,faith,,,Multiple Choice
Notes,T,notes,,,
Vol Interest,T,,T,Volunteer,
Phone A,T,phone,,,
Phone B,T,phone,,,
"""

RELIGIONS_CSV = """Values in Data,Replacement Values
christian,Christianity
"""

def test_cli_help():
    out = subprocess.run(
        [sys.executable, "-m", "jcf_nb_migration_spark", "--help"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO})
    assert out.returncode == 0
    assert "--setup" in out.stdout and "--meta" in out.stdout

def test_cli_setup(tmp_path):
    outdir = tmp_path / "out"
    outdir.mkdir()
    (outdir / "stale.txt").write_text("old")
    r = subprocess.run(
        [sys.executable, "-m", "jcf_nb_migration_spark", "--setup",
         "--output-dir", str(outdir), "--cache-dir", str(tmp_path / "meta")],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PYTHONPATH": REPO})
    assert r.returncode == 0, r.stderr
    assert outdir.is_dir() and not (outdir / "stale.txt").exists()
    assert "metadata cache missing" in r.stderr  # warning surfaced

def test_cli_default_pipeline(tmp_path):
    cache = tmp_path / "meta"
    cache.mkdir()
    (cache / "STM.csv").write_text(STM_CSV)
    (cache / "RELIGIONS.csv").write_text(RELIGIONS_CSV)
    data = tmp_path / "crm.csv"
    data.write_text(CRM_CSV)
    outdir = tmp_path / "out"

    r = subprocess.run(
        [sys.executable, "-m", "jcf_nb_migration_spark",
         "--data", str(data), "--cache-dir", str(cache),
         "--output-dir", str(outdir), "--sample-size", "2"],
        capture_output=True, text=True, cwd=REPO, timeout=300,
        env={**os.environ, "PYTHONPATH": REPO})
    assert r.returncode == 0, r.stderr[-3000:]

    out_csv = (outdir / "output.csv").read_text()
    header = out_csv.splitlines()[0]
    assert "email" in header and "phone" in header and "tags" in header
    assert "Vol Interest" in header          # tag-only passthrough
    assert "e2@x" not in out_csv             # test row purged
    assert "Christianity" in out_csv         # J2 lookup applied
    assert "555, 556" in out_csv             # concat merge
    assert "03/07/2019" in out_csv           # date rewrite

    assert (outdir / "deleted_test_rows.csv").read_text().count("e2@x") == 1
    faith_list = (outdir / "customFieldValues" /
                  "Are you a person of faith?.csv").read_text()
    assert "Christianity" in faith_list
    assert (outdir / "concat_audit.csv").exists()
    assert (outdir / "dataColsMissingFromMeta.csv").exists()

def test_hostile_column_name_stays_inside_sink_dir(tmp_path):
    """S5 sink filenames come from STM column names — a name with a
    path separator (or '..') must be sanitized, not escape the output
    directory. Runs main() in-process so the suite's Spark session is
    reused."""
    from jcf_nb_migration_spark.__main__ import main, safe_filename

    assert safe_filename("a/b\\c:d") == "a_b_c:d"
    assert safe_filename("..") == "__"
    assert safe_filename("ok name?") == "ok name?"   # reference parity

    cache = tmp_path / "meta"
    cache.mkdir()
    (cache / "STM.csv").write_text(
        "fullColName,IN SCOPE,NB TARGET FIELD,Tag?,Tag Name,"
        "Custom Field Type?\n"
        "Email,T,email,,,\n"
        "Evil/../Name,T,evil,,,Multiple Choice\n")
    data = tmp_path / "crm.csv"
    data.write_text("Email,Evil/../Name\ne1@x,v1\ne3@x,v2\n")
    outdir = tmp_path / "out"

    rc = main(["--data", str(data), "--cache-dir", str(cache),
               "--output-dir", str(outdir)])
    assert rc == 0
    written = sorted(p.name for p in (outdir / "customFieldValues").iterdir())
    assert written == ["Evil_.._Name.csv"]
    # nothing escaped above the sink dir
    assert not (tmp_path / "Name.csv").exists()


def test_cli_meta_without_gspread_fails_gracefully(tmp_path):
    r = subprocess.run(
        [sys.executable, "-m", "jcf_nb_migration_spark", "--meta",
         "--cache-dir", str(tmp_path / "meta"),
         "--output-dir", str(tmp_path / "out")],
        capture_output=True, text=True, cwd=REPO, timeout=300,
        env={**os.environ, "PYTHONPATH": REPO})
    assert r.returncode == 3
    assert "--meta unavailable" in r.stderr
