"""Persisted document store (io/docstore.py) — the fetch-by-id half
of the serving stack. Pins the module's three claims:

1. Fetch correctness: point lookups return exactly the requested
   documents with all columns, before and after appends/compaction,
   and across a fresh-session attach.
2. Plan shape: the id list lands as a pushed ``In`` filter and the
   scan is bucket-pruned (``SelectedBucketsCount ≤ |ids|`` — made
   visible by disabling autoBucketedScan; the default path prunes the
   same files without printing the count) with ZERO Exchange.
3. Safety rails: shared replay-ledger idempotence, catalog/bucket-count
   validation, meta-recorded schema on attach (field names validated
   at every nesting level), write-side stale-registration guards,
   integral-id fetch contract, exclusive-path rebuild clearing the
   ledger.
4. The serving_bench tool's end-to-end contract (smoke test).
"""

import os
import re

import pytest
from pyspark.sql import functions as F

from jcf_nb_migration_spark.io.docstore import (
    DOCS_SUBDIR,
    docstore_append,
    docstore_attach,
    docstore_build,
    docstore_compact,
    docstore_fetch,
    docstore_maintain,
)

SCHEMA = "doc_id bigint, text string, lang string, n_chars bigint"


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, f"body of doc {i}", "en" if i % 2 else "de", 100 + i)
         for i in ids], SCHEMA)


def _fetch_rows(spark, prefix, path, ids):
    return sorted(
        (r["doc_id"], r["text"], r["lang"], r["n_chars"]) for r in
        docstore_fetch(spark, prefix, path, ids).collect())


def _opened_buckets(df):
    """Bucket ids of the files actually placed into the scan's
    FilePartitions — the post-bucket-filter read set (the numFiles
    METRIC counts the pre-filter listing, so it cannot show bucket
    pruning). Bucket id parsed from Spark's bucketed file naming
    (..._NNNNN.c000...)."""
    from jcf_nb_migration_spark.testing import files_touched

    names = files_touched(df)["names"]
    return [int(re.search(r"_(\d{5})\.", n).group(1)) for n in names]


def test_build_fetch_returns_requested_docs(spark, tmp_path):
    path = str(tmp_path / "ds")
    docstore_build(_docs(spark, range(50)), "dst_base", path,
                   num_buckets=8)
    got = _fetch_rows(spark, "dst_base", path, [3, 17, 42])
    assert got == [(3, "body of doc 3", "en", 103),
                   (17, "body of doc 17", "en", 117),
                   (42, "body of doc 42", "de", 142)]
    # absent ids simply don't come back
    assert _fetch_rows(spark, "dst_base", path, [3, 9999]) == [
        (3, "body of doc 3", "en", 103)]


def test_fetch_plan_bucket_pruned_no_exchange(spark, tmp_path):
    path = str(tmp_path / "ds_plan")
    docstore_build(_docs(spark, range(200)), "dst_plan", path,
                   num_buckets=8)
    ids = [7, 31, 101]
    old = spark.conf.get(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        f = docstore_fetch(spark, "dst_plan", path, ids)
        plan = f._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", old)
    assert "Exchange" not in plan, plan
    assert "PushedFilters: [In(doc_id" in plan, plan
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m and int(m.group(1)) <= len(ids) and m.group(2) == "8", plan
    # default path: the scan is demoted (Bucketed: false) but Spark's
    # non-bucketed read path filters files through the SAME bucket set
    # (FileSourceScanExec.createReadRDD's shouldProcess) — pin it by
    # counting the files actually placed into the scan's
    # FilePartitions, which must be ≤ the target buckets' share
    fd = docstore_fetch(spark, "dst_plan", path, ids)
    plan_default = fd._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(doc_id" in plan_default, plan_default
    assert "Exchange" not in plan_default, plan_default
    # exact membership check, no file-uniformity assumption: the
    # buckets of the opened files must be exactly the ids' buckets
    # (bucket id = pmod(hash(doc_id), n) — Spark's bucketizer IS the
    # SQL murmur3 hash)
    target = {r[0] for r in spark.createDataFrame(
        [(i,) for i in ids], "doc_id bigint")
        .select(F.expr("pmod(hash(doc_id), 8)")).collect()}
    opened = set(_opened_buckets(fd))
    assert opened == target, (opened, target)
    # single-id fetch: exactly one bucket's files
    assert len(set(_opened_buckets(
        docstore_fetch(spark, "dst_plan", path, [7])))) == 1


def test_append_fetch_matches_rebuild(spark, tmp_path):
    path = str(tmp_path / "ds_app")
    docstore_build(_docs(spark, range(30)), "dst_app", path,
                   num_buckets=4)
    assert docstore_append(_docs(spark, range(30, 40)), "dst_app",
                           path, num_buckets=4, batch_id=0) is True
    rb = str(tmp_path / "ds_rb")
    docstore_build(_docs(spark, range(40)), "dst_rb", rb, num_buckets=4)
    ids = [5, 29, 33, 39]
    assert (_fetch_rows(spark, "dst_app", path, ids)
            == _fetch_rows(spark, "dst_rb", rb, ids))


def test_append_replay_ledger_idempotent(spark, tmp_path):
    path = str(tmp_path / "ds_rp")
    docstore_build(_docs(spark, range(10)), "dst_rp", path,
                   num_buckets=4)
    batch = _docs(spark, range(10, 15))
    assert docstore_append(batch, "dst_rp", path, num_buckets=4,
                           batch_id=7) is True
    n = spark.table("dst_rp_docs").count()
    assert docstore_append(batch, "dst_rp", path, num_buckets=4,
                           batch_id=7) is False
    assert spark.table("dst_rp_docs").count() == n


def test_attach_restores_schema_from_meta(spark, tmp_path):
    path = str(tmp_path / "ds_att")
    docstore_build(_docs(spark, range(20)), "dst_att", path,
                   num_buckets=4)
    expect = _fetch_rows(spark, "dst_att", path, [1, 2, 3])
    spark.sql("DROP TABLE dst_att_docs")
    docstore_attach(spark, "dst_att", path, num_buckets=4)
    assert _fetch_rows(spark, "dst_att", path, [1, 2, 3]) == expect
    assert [f.name for f in spark.table("dst_att_docs").schema.fields] \
        == ["doc_id", "text", "lang", "n_chars"]
    # appends work post-attach (fresh-session ingest)
    assert docstore_append(_docs(spark, range(20, 22)), "dst_att",
                           path, num_buckets=4) is True
    # wrong bucket count refuses via the on-disk meta
    spark.sql("DROP TABLE dst_att_docs")
    with pytest.raises(ValueError, match="built with 4 buckets"):
        docstore_attach(spark, "dst_att", path, num_buckets=8)


def test_fetch_stale_location_refuses(spark, tmp_path):
    path = str(tmp_path / "ds_loc")
    docstore_build(_docs(spark, range(5)), "dst_loc", path,
                   num_buckets=4)
    with pytest.raises(ValueError, match="registered at"):
        docstore_fetch(spark, "dst_loc", str(tmp_path / "elsewhere"),
                       [1])


def test_append_requires_catalog_table(spark, tmp_path):
    with pytest.raises(ValueError, match="not registered"):
        docstore_append(_docs(spark, range(3)), "dst_ghost",
                        str(tmp_path / "ghost"))


def test_build_requires_doc_id_and_identifier_columns(spark, tmp_path):
    with pytest.raises(ValueError, match="doc_id"):
        docstore_build(spark.createDataFrame([(1,)], "x bigint"),
                       "dst_bad", str(tmp_path / "bad"))
    bad = (spark.createDataFrame([(1, "a")], "doc_id bigint, t string")
           .withColumnRenamed("t", "bad name"))
    with pytest.raises(ValueError, match="identifier"):
        docstore_build(bad, "dst_bad2", str(tmp_path / "bad2"))


def test_rebuild_clears_ledger(spark, tmp_path):
    path = str(tmp_path / "ds_rb2")
    batch = _docs(spark, [50])
    docstore_build(_docs(spark, range(5)), "dst_rb2", path,
                   num_buckets=4)
    assert docstore_append(batch, "dst_rb2", path, num_buckets=4,
                           batch_id=0) is True
    docstore_build(_docs(spark, range(5)), "dst_rb2", path,
                   num_buckets=4)
    # same batch_id must land again after the rebuild
    assert docstore_append(batch, "dst_rb2", path, num_buckets=4,
                           batch_id=0) is True
    assert _fetch_rows(spark, "dst_rb2", path, [50]) == [
        (50, "body of doc 50", "de", 150)]


def test_compact_preserves_fetch_and_ledger_epoch(spark, tmp_path):
    path = str(tmp_path / "ds_cmp")
    docstore_build(_docs(spark, range(12)), "dst_cmp", path,
                   num_buckets=4)
    for b in range(3):
        docstore_append(_docs(spark, range(12 + 4 * b, 16 + 4 * b)),
                        "dst_cmp", path, num_buckets=4, batch_id=b)
    docs_dir = os.path.join(path, DOCS_SUBDIR)
    n_before = sum(1 for f in os.listdir(docs_dir)
                   if f.endswith(".parquet"))
    ids = [0, 13, 19, 23]
    before = _fetch_rows(spark, "dst_cmp", path, ids)
    n_after = docstore_compact(spark, "dst_cmp", path, num_buckets=4)
    assert n_after <= 4 < n_before
    assert _fetch_rows(spark, "dst_cmp", path, ids) == before
    # ledger epoch unchanged: a replayed committed batch still skips
    assert docstore_append(_docs(spark, range(12, 16)), "dst_cmp",
                           path, num_buckets=4, batch_id=0) is False
    # maintain gate: quiet post-compact, fires past the threshold
    assert docstore_maintain(spark, "dst_cmp", path, num_buckets=4,
                             max_files_per_bucket=1) is False
    for b in range(10, 15):
        docstore_append(_docs(spark, [100 + b]), "dst_cmp", path,
                        num_buckets=4, batch_id=b)
    assert docstore_maintain(spark, "dst_cmp", path, num_buckets=4,
                             max_files_per_bucket=1) is True
    assert _fetch_rows(spark, "dst_cmp", path, [110, 114]) == [
        (110, "body of doc 110", "de", 210),
        (114, "body of doc 114", "de", 214)]


def test_write_paths_refuse_stale_registration(spark, tmp_path):
    """The write-side location guard (r9 review fix): with a same-
    prefix table registered at A, pointing append or compact at a
    DIFFERENT path must refuse — compacting under a stale registration
    would destructively overwrite the target path with A's rows."""
    a = str(tmp_path / "ds_a")
    b = str(tmp_path / "ds_b")
    docstore_build(_docs(spark, range(5)), "dst_stale", a, num_buckets=4)
    with pytest.raises(ValueError, match="registered at"):
        docstore_append(_docs(spark, [9]), "dst_stale", b, num_buckets=4)
    with pytest.raises(ValueError, match="registered at"):
        docstore_compact(spark, "dst_stale", b, num_buckets=4)
    # and the scenario from the review: b holds another VALID store
    docstore_build(_docs(spark, range(50, 55)), "dst_other", b,
                   num_buckets=4)
    with pytest.raises(ValueError, match="registered at"):
        docstore_compact(spark, "dst_stale", b, num_buckets=4)
    # b's store is untouched
    assert _fetch_rows(spark, "dst_other", b, [51]) == [
        (51, "body of doc 51", "en", 151)]


def test_fetch_rejects_non_int_ids(spark, tmp_path):
    """Fetch ids must be plain ints: floats would silently truncate
    (17.9 -> doc 17), strings contradict the integral-doc_id build
    contract (r9 review fix)."""
    path = str(tmp_path / "ds_ids")
    docstore_build(_docs(spark, range(5)), "dst_ids", path,
                   num_buckets=4)
    with pytest.raises(TypeError, match="must be integers"):
        docstore_fetch(spark, "dst_ids", path, [17.9])
    with pytest.raises(TypeError, match="must be integers"):
        docstore_fetch(spark, "dst_ids", path, ["doc-17"])
    with pytest.raises(TypeError, match="must be integers"):
        docstore_fetch(spark, "dst_ids", path, [True])


def test_build_requires_integral_doc_id(spark, tmp_path):
    with pytest.raises(ValueError, match="integral"):
        docstore_build(
            spark.createDataFrame([("a", 1)], "doc_id string, v bigint"),
            "dst_strid", str(tmp_path / "strid"))


def test_serving_bench_tool_smoke():
    """tools/serving_bench.py runs end-to-end at the small fixture and
    emits the JSON contract (families, latency + data-touched keys) —
    pins the tool's imports and the FilePartition metric walker."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    out = subprocess.run(
        [sys.executable, "tools/serving_bench.py",
         "/root/testdata/sf0.001", "1"],
        cwd=repo, capture_output=True, text=True, timeout=420,
        env={**__import__("os").environ, "PYTHONPATH": str(repo)})
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    for fam in ("bm25", "phrase", "fetch", "ann"):
        assert rep[fam]["served"] > 0 and rep[fam]["adhoc"] > 0
    assert rep["ann"]["served_touched"]["files"] > 0
    assert rep["bm25"]["served_touched"]["bytes"] > 0
    assert (rep["bm25"]["adhoc_touched"]["bytes"]
            > rep["bm25"]["served_touched"]["bytes"])
    # r10 mutation family: COW upsert/delete measured against the full
    # rebuild they replace; the rewrite is bounded by touched buckets
    assert rep["mutate"]["upsert_cow"] > 0
    assert rep["mutate"]["delete_cow"] > 0
    assert rep["mutate"]["full_rebuild"] > 0
    assert 0 < rep["mutate"]["touched_buckets"] <= rep["mutate"]["num_buckets"]
    # the scale signal: the COW rewrote a strict fraction of the store
    assert 0 < rep["mutate"]["rewritten_bytes"] < rep["mutate"]["store_bytes"]
    # r10 z-order family: the stats-pruned scan must read a strict
    # subset of the files (and bytes) the full-list filter scan reads
    assert rep["zorder"]["served"] > 0 and rep["zorder"]["adhoc"] > 0
    assert 0 < rep["zorder"]["files_kept"] < rep["zorder"]["files_total"]
    assert (rep["zorder"]["served_touched"]["bytes"]
            < rep["zorder"]["adhoc_touched"]["bytes"])
    assert rep["compact_sec"] > 0


def test_build_rejects_nested_bad_field_names(spark, tmp_path):
    """Nested struct field names land verbatim in the attach DDL —
    a space- or quote-bearing nested name must be rejected at BUILD
    time, not fail (or inject) at attach (r9 review fix)."""
    from pyspark.sql import functions as F

    bad = spark.createDataFrame(
        [(1, 2)], "doc_id bigint, x bigint").select(
        "doc_id", F.struct(F.col("x").alias("my field")).alias("s"))
    with pytest.raises(ValueError, match="nested field name"):
        docstore_build(bad, "dst_nest", str(tmp_path / "nest"))


def test_append_refuses_type_drift(spark, tmp_path):
    """ADVICE r9 (low): an append batch whose column TYPE drifted from
    the table schema (doc_id as double, n_chars as string) must refuse
    before writing — mode("append") would otherwise land parquet files
    with a mismatched physical type that breaks every later
    fetch/compact read. Missing columns refuse with a clear message
    too (previously a bare AnalysisException from the select)."""
    path = str(tmp_path / "ds_drift")
    docstore_build(_docs(spark, range(5)), "dst_drift", path,
                   num_buckets=4)
    drifted = spark.createDataFrame(
        [(9.0, "body of doc 9", "en", "109")],
        "doc_id double, text string, lang string, n_chars string")
    with pytest.raises(ValueError, match="types drifted"):
        docstore_append(drifted, "dst_drift", path, num_buckets=4)
    missing = spark.createDataFrame(
        [(9, "body of doc 9")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="missing docstore columns"):
        docstore_append(missing, "dst_drift", path, num_buckets=4)
    # extra columns in the batch are fine — the select projects them
    # away; the store's schema is authoritative
    extra = _docs(spark, [9]).withColumn("extra", F.lit("x"))
    assert docstore_append(extra, "dst_drift", path, num_buckets=4)
    assert _fetch_rows(spark, "dst_drift", path, [9]) == [
        (9, "body of doc 9", "en", 109)]


# --- r10: copy-on-write upsert/delete ---------------------------------


def _file_hashes(path):
    """name -> md5 of every parquet file under the docs dir."""
    import hashlib

    d = os.path.join(path, DOCS_SUBDIR)
    return {f: hashlib.md5(open(os.path.join(d, f), "rb").read())
            .hexdigest()
            for f in os.listdir(d) if f.endswith(".parquet")}


def test_upsert_updates_inserts_touched_buckets_only(spark, tmp_path):
    """MERGE semantics via COW: existing ids replaced, new ids
    inserted — and every parquet file of an UNTOUCHED bucket is
    byte-identical afterwards (the rewrite is bounded by the batch's
    buckets, the core 100 TB claim)."""
    from jcf_nb_migration_spark.io.docstore import (_file_bucket_id,
                                                    _touched_buckets,
                                                    docstore_upsert)

    path = str(tmp_path / "ds_cow")
    docstore_build(_docs(spark, range(20)), "dst_cow", path,
                   num_buckets=4)
    before = _file_hashes(path)
    batch = spark.createDataFrame(
        [(3, "v2 of 3", "xx", 999), (11, "v2 of 11", "xx", 998),
         (100, "brand new", "new", 9)], SCHEMA)
    assert docstore_upsert(batch, "dst_cow", path, num_buckets=4,
                           batch_id="m1") is True
    touched = _touched_buckets(batch.select("doc_id"), 4)
    after = _file_hashes(path)
    for name, h in before.items():
        if _file_bucket_id(name) not in touched:
            assert after.get(name) == h, f"untouched file {name} changed"
        else:
            assert name not in after  # old touched files replaced
    assert _fetch_rows(spark, "dst_cow", path, [3, 11, 100, 5]) == [
        (3, "v2 of 3", "xx", 999), (5, "body of doc 5", "en", 105),
        (11, "v2 of 11", "xx", 998), (100, "brand new", "new", 9)]
    # ledger: replaying the same batch id is a no-op
    assert docstore_upsert(batch, "dst_cow", path, num_buckets=4,
                           batch_id="m1") is False
    # duplicate ids within one batch are ambiguous -> raise
    dup = spark.createDataFrame(
        [(7, "a", "en", 1), (7, "b", "en", 2)], SCHEMA)
    with pytest.raises(ValueError, match="duplicate doc_id"):
        docstore_upsert(dup, "dst_cow", path, num_buckets=4)
    # type drift refuses before any file lands (shared check)
    drifted = spark.createDataFrame(
        [(9.0, "x", "en", "9")],
        "doc_id double, text string, lang string, n_chars string")
    with pytest.raises(ValueError, match="types drifted"):
        docstore_upsert(drifted, "dst_cow", path, num_buckets=4)


def test_delete_removes_rows_cow(spark, tmp_path):
    """Eager physical deletion: deleted ids are gone from disk when
    the call returns (fetch finds nothing), other rows and untouched
    bucket files are intact; absent ids are no-ops; ledger replays
    skip."""
    from jcf_nb_migration_spark.io.docstore import (_file_bucket_id,
                                                    _touched_buckets,
                                                    docstore_delete)

    path = str(tmp_path / "ds_del")
    docstore_build(_docs(spark, range(16)), "dst_del", path,
                   num_buckets=4)
    before = _file_hashes(path)
    ids_frame = spark.createDataFrame([(2,), (7,)], "doc_id bigint")
    touched = _touched_buckets(ids_frame, 4)
    assert docstore_delete(spark, "dst_del", path, [2, 7],
                           num_buckets=4, batch_id="d1") is True
    after = _file_hashes(path)
    for name, h in before.items():
        if _file_bucket_id(name) not in touched:
            assert after.get(name) == h
    assert docstore_fetch(spark, "dst_del", path, [2, 7]).count() == 0
    assert _fetch_rows(spark, "dst_del", path, [1, 3]) == [
        (1, "body of doc 1", "en", 101), (3, "body of doc 3", "en", 103)]
    # replay + absent-id no-op + validation
    assert docstore_delete(spark, "dst_del", path, [2, 7],
                           num_buckets=4, batch_id="d1") is False
    assert docstore_delete(spark, "dst_del", path, [999],
                           num_buckets=4) is True
    assert _fetch_rows(spark, "dst_del", path, [1])  # store intact
    with pytest.raises(TypeError, match="integers"):
        docstore_delete(spark, "dst_del", path, [1.5], num_buckets=4)
    assert docstore_delete(spark, "dst_del", path, [],
                           num_buckets=4) is False
    with pytest.raises(ValueError, match="registered at"):
        docstore_delete(spark, "dst_del", str(tmp_path / "elsewhere"),
                        [1], num_buckets=4)


def test_cow_clears_crashed_swap_residue(spark, tmp_path):
    """A crash between the COW move phases strands .cowstage/.cowold
    dirs; the next mutation clears them and completes."""
    path = str(tmp_path / "ds_res")
    docstore_build(_docs(spark, range(8)), "dst_res", path,
                   num_buckets=4)
    from jcf_nb_migration_spark.io.docstore import docstore_upsert

    for residue in ("docs.cowstage", "docs.cowold"):
        d = os.path.join(path, residue)
        os.makedirs(d, exist_ok=True)
        open(os.path.join(d, "junk.parquet"), "w").write("junk")
    batch = spark.createDataFrame([(1, "v2", "xx", 1)], SCHEMA)
    assert docstore_upsert(batch, "dst_res", path, num_buckets=4)
    assert not os.path.isdir(os.path.join(path, "docs.cowstage"))
    assert not os.path.isdir(os.path.join(path, "docs.cowold"))
    assert _fetch_rows(spark, "dst_res", path, [1]) == [(1, "v2", "xx", 1)]


def test_upsert_then_compact_preserves_fetch(spark, tmp_path):
    """COW output composes with the shared compactor: post-compaction
    fetch returns the merged state."""
    from jcf_nb_migration_spark.io.docstore import docstore_upsert

    path = str(tmp_path / "ds_cc")
    docstore_build(_docs(spark, range(12)), "dst_cc", path,
                   num_buckets=4)
    batch = spark.createDataFrame(
        [(4, "v2 of 4", "xx", 44), (50, "new 50", "new", 5)], SCHEMA)
    docstore_upsert(batch, "dst_cc", path, num_buckets=4)
    docstore_compact(spark, "dst_cc", path, num_buckets=4)
    assert _fetch_rows(spark, "dst_cc", path, [4, 50, 6]) == [
        (4, "v2 of 4", "xx", 44), (6, "body of doc 6", "de", 106),
        (50, "new 50", "new", 5)]


def test_add_columns_additive_evolution(spark, tmp_path):
    """Additive schema evolution (r10): new nullable columns declared
    on table + meta; old rows read NULL (parquet missing-column
    contract), post-evolution writes must carry the columns (the
    schema check turns a stale producer into a loud failure, not a
    silent null), and a fresh-session attach sees the evolved DDL."""
    from jcf_nb_migration_spark.io.docstore import docstore_add_columns

    path = str(tmp_path / "ds_evo")
    docstore_build(_docs(spark, range(6)), "dst_evo", path,
                   num_buckets=4)
    docstore_add_columns(spark, "dst_evo", path,
                         {"quality": "double", "split": "string"},
                         num_buckets=4)
    # old rows: nulls in the new columns, everything else intact
    row = docstore_fetch(spark, "dst_evo", path, [2]).head()
    assert row["text"] == "body of doc 2"
    assert row["quality"] is None and row["split"] is None
    # a stale producer (old 4-column batch) now fails loudly
    with pytest.raises(ValueError, match="missing docstore columns"):
        docstore_append(_docs(spark, [10]), "dst_evo", path,
                        num_buckets=4)
    # a current producer writes values for the evolved columns
    batch = spark.createDataFrame(
        [(10, "body of doc 10", "en", 110, 0.75, "train")],
        SCHEMA + ", quality double, split string")
    assert docstore_append(batch, "dst_evo", path, num_buckets=4)
    got = docstore_fetch(spark, "dst_evo", path, [10]).head()
    assert got["quality"] == 0.75 and got["split"] == "train"
    # fresh-session attach reads the evolved meta DDL
    spark.sql("DROP TABLE dst_evo_docs")
    docstore_attach(spark, "dst_evo", path, num_buckets=4)
    assert docstore_fetch(spark, "dst_evo", path, [2]).head()[
        "quality"] is None
    # guards: duplicate name, bad identifier, unsafe type, empty set
    for bad, msg in (({"quality": "double"}, "already exists"),
                     ({"bad name": "double"}, "identifier"),
                     ({"x": "double'); drop"}, "unsafe"),
                     ({}, "at least one")):
        with pytest.raises(ValueError, match=msg):
            docstore_add_columns(spark, "dst_evo", path, bad,
                                 num_buckets=4)
