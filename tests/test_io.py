"""IO surface tests: CSV round-trips (S1/S4), header normalization
(P5), distinct-value list sinks (S5), schema-diff reports (S9/T4),
metadata cache (S2), gsheets gating (S3/S8), setup lifecycle (S10)."""

import os

import pytest

from jcf_nb_migration_spark.io.gsheets import (
    HAVE_GSPREAD,
    fetch_metadata_from_gsheet,
    load_metadata_from_cache,
    push_repeated_data_sheets,
    setup_workspace,
)
from jcf_nb_migration_spark.io.readers import read_csv
from jcf_nb_migration_spark.io.writers import (
    write_distinct_value_lists,
    write_sample_csv,
    write_schema_diff_reports,
    write_single_csv,
)


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path)


def test_csv_roundtrip_multiline_and_header_newline(spark, workdir):
    # embedded newline in a value AND in a header name (P5 + multiLine)
    path = os.path.join(workdir, "in.csv")
    with open(path, "w") as fh:
        fh.write('"Full\nName",Notes\n"Ann","line1\nline2"\n')
    df = read_csv(spark, path, all_string=True)
    assert df.columns == ["FullName", "Notes"]
    row = df.collect()[0]
    assert row["Notes"] == "line1\nline2"


def test_write_single_csv_is_one_file(spark, workdir):
    df = spark.range(100).selectExpr("id", "id * 2 AS dbl")
    out = os.path.join(workdir, "out.csv")
    write_single_csv(df.repartition(8), out)
    assert os.path.isfile(out)
    back = read_csv(spark, out, all_string=True)
    assert back.count() == 100


def test_sample_sink_limits(spark, workdir):
    df = spark.range(500).selectExpr("id")
    out = os.path.join(workdir, "sample.csv")
    write_sample_csv(df, out, n=10)
    assert read_csv(spark, out, all_string=True).count() == 10


def test_distinct_value_lists(spark, workdir):
    df = spark.createDataFrame(
        [("a",), ("b",), ("a",), (None,), ("",)], "Choice string")
    paths = write_distinct_value_lists(df, ["Choice"],
                                       os.path.join(workdir, "lists"))
    got = sorted(open(paths["Choice"]).read().split())
    assert got == ["Choice", "a", "b"]  # header + non-blank distinct


def test_schema_diff_reports(workdir):
    p1, p2 = write_schema_diff_reports(
        ["A", "B"], ["B", "C"], os.path.join(workdir, "diffs"))
    assert open(p1).read().splitlines()[1:] == ["A"]
    assert open(p2).read().splitlines()[1:] == ["C"]


def test_metadata_cache_roundtrip(spark, workdir):
    cache = os.path.join(workdir, "cache")
    os.makedirs(cache)
    with open(os.path.join(cache, "STM.csv"), "w") as fh:
        fh.write("fullColName,IN SCOPE\nEmail,T\n")
    tables = load_metadata_from_cache(spark, cache)
    assert set(tables) == {"STM"}
    assert tables["STM"].collect()[0]["fullColName"] == "Email"


def test_gsheets_gated_without_dependency(spark):
    if HAVE_GSPREAD:  # pragma: no cover - not in this environment
        pytest.skip("gspread installed")
    with pytest.raises(NotImplementedError):
        fetch_metadata_from_gsheet(spark, "key.json", "Book", "/tmp/x", [])
    with pytest.raises(NotImplementedError):
        push_repeated_data_sheets(None, [], "Email", "key.json", "Book")


def test_setup_workspace(workdir):
    out = os.path.join(workdir, "customFieldValues")
    os.makedirs(out)
    with open(os.path.join(out, "stale.csv"), "w") as fh:
        fh.write("old")
    warnings = setup_workspace(out, api_key_file=os.path.join(workdir, "no.json"),
                               cache_dir=os.path.join(workdir, "nocache"))
    assert os.path.isdir(out) and not os.listdir(out)  # recreated empty
    assert len(warnings) == 2


def test_partitioned_parquet_prunes(spark, workdir):
    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.io.writers import write_partitioned_parquet

    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3]) for i in range(90)], "id long, seg string")
    out = os.path.join(workdir, "pq")
    write_partitioned_parquet(df, out, ["seg"])
    dirs = {d for d in os.listdir(out) if d.startswith("seg=")}
    assert dirs == {"seg=a", "seg=b", "seg=c"}
    back = spark.read.parquet(out).where(F.col("seg") == "b")
    assert back.count() == 30
    # partition filter must prune at the source, not post-filter
    plan = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "PartitionFilters: [isnotnull(seg" in plan


def test_jsonl_roundtrip_with_corrupt_line(spark, workdir):
    from jcf_nb_migration_spark.io.readers import read_jsonl
    from jcf_nb_migration_spark.io.writers import write_jsonl

    d = os.path.join(workdir, "docs_jsonl")
    df = spark.createDataFrame(
        [(1, "hello world", "en"), (2, "bonjour", "fr")],
        "doc_id long, text string, lang string")
    write_jsonl(df, d, compression=None)
    back = read_jsonl(spark, d, schema="doc_id long, text string, lang string")
    assert {tuple(r) for r in back.collect()} == \
        {(1, "hello world", "en"), (2, "bonjour", "fr")}

    # corrupt line: PERMISSIVE mode captures, doesn't fail the job
    bad = os.path.join(workdir, "bad_jsonl")
    os.makedirs(bad, exist_ok=True)
    with open(os.path.join(bad, "part-0.json"), "w") as fh:
        fh.write('{"doc_id": 1, "text": "ok"}\n')
        fh.write('this is not json\n')
    got = read_jsonl(
        spark, bad,
        schema="doc_id long, text string, _corrupt_record string")
    rows = got.collect()
    assert len(rows) == 2
    ok = [r for r in rows if r["doc_id"] == 1][0]
    corrupt = [r for r in rows if r["doc_id"] is None][0]
    assert ok["text"] == "ok" and ok["_corrupt_record"] is None
    assert corrupt["_corrupt_record"] == "this is not json"


def test_cluster_write_gives_disjoint_file_stats(spark, workdir):
    """Range-clustered writes must give each file a disjoint key
    slice with tight row-group min/max stats — the property that makes
    parquet pruning effective at scale."""
    import glob

    import pyarrow.parquet as pq

    from jcf_nb_migration_spark.io.layout import cluster_write

    df = spark.range(100_000).selectExpr(
        "id", "cast(id % 97 as double) as noise")
    out = os.path.join(workdir, "clustered")
    cluster_write(df, out, ["id"], num_files=8)

    ranges = []
    for f in sorted(glob.glob(os.path.join(out, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        col_idx = [md.schema.column(i).name
                   for i in range(md.num_columns)].index("id")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 4
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, "file key ranges overlap — no pruning possible"

    # and Spark's scan actually exploits it: a point filter reads a
    # fraction of the rows' files (pushed filter visible in the plan)
    back = spark.read.parquet(out).where("id = 54321")
    plan = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "PushedFilters: [IsNotNull(id), EqualTo(id,54321)]" in plan
    assert back.count() == 1


def _file_stats(out_dir, col_names):
    """Per-file (min, max) for each named column from parquet footers."""
    import glob

    import pyarrow.parquet as pq

    stats = []
    for f in sorted(glob.glob(os.path.join(out_dir, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        per_col = {}
        for c in col_names:
            ci = names.index(c)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                mins.append(st.min)
                maxs.append(st.max)
            per_col[c] = (min(mins), max(maxs))
        stats.append(per_col)
    return stats


def test_zorder_write_prunes_on_both_dimensions(spark, workdir):
    """Z-order vs lexicographic clustering on a 256x256 grid: the
    lexicographic layout prunes only on the leading column (every file
    spans the full y domain), while the z-ordered layout gives every
    file a bounded slice of BOTH dimensions, so a band predicate on
    either column excludes most files by min/max stats."""
    from jcf_nb_migration_spark.io.layout import cluster_write, zorder_write

    df = spark.range(256 * 256).selectExpr(
        "cast(id % 256 as bigint) as x", "cast(id div 256 as bigint) as y")
    zdir = os.path.join(workdir, "zordered")
    ldir = os.path.join(workdir, "lexico")
    zorder_write(df, zdir, ["x", "y"], num_files=16, bits=8)
    cluster_write(df, ldir, ["x", "y"], num_files=16)

    zstats = _file_stats(zdir, ["x", "y"])
    lstats = _file_stats(ldir, ["x", "y"])
    assert len(zstats) >= 8 and len(lstats) >= 8

    def files_hit(stats, col, lo, hi):
        return sum(1 for s in stats
                   if not (s[col][1] < lo or s[col][0] > hi))

    # trailing-dimension band y in [0, 31]: lexicographic hits every
    # file; z-order must exclude at least half
    assert files_hit(lstats, "y", 0, 31) == len(lstats)
    assert files_hit(zstats, "y", 0, 31) <= len(zstats) // 2
    # leading dimension still prunes under z-order too
    assert files_hit(zstats, "x", 0, 31) <= len(zstats) // 2
    # and files are tight on average in both dimensions (a file whose
    # z-range straddles a top-level quadrant boundary can legitimately
    # span a full dim — Morton curves have O(1) such files per level)
    for c in ("x", "y"):
        spans = [s[c][1] - s[c][0] for s in zstats]
        assert sum(spans) / len(spans) <= 128
        assert sum(1 for sp in spans if sp > 192) <= 3

    # Spark's scan exploits it: pushed band filter on y
    back = spark.read.parquet(zdir).where("y between 0 and 31")
    plan = back._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "GreaterThanOrEqual(y,0)" in plan
    assert back.count() == 256 * 32


def test_variant_parquet_round_trip(spark, tmp_path):
    """VARIANT persists through parquet: parse once, write, read back
    as variant (not string), typed-extract without re-parsing — the
    persist-the-parsed-payload pattern events_variant_extract's
    docstring promises for downstream readers."""
    import os

    from pyspark.sql import functions as F

    d = os.path.join(str(tmp_path), "var")
    src = spark.range(10).select(
        "id",
        F.parse_json(F.concat(F.lit('{"k": '), F.col("id"),
                              F.lit(', "tag": "t'), F.col("id") % 3,
                              F.lit('"}'))).alias("v"))
    src.write.parquet(d)
    back = spark.read.parquet(d)
    assert dict(back.dtypes)["v"] == "variant"
    got = (back.selectExpr(
        "variant_get(v, '$.k', 'bigint') AS k",
        "variant_get(v, '$.tag', 'string') AS tag")
        .orderBy("k").collect())
    assert [r.k for r in got] == list(range(10))
    assert got[4].tag == "t1"


def test_parquet_merge_schema_reads_evolved_shards(spark, tmp_path):
    """Schema evolution: a later shard added a column; mergeSchema
    unions the footers so both shards read as one frame, with NULLs
    where the old shard predates the column — and the default
    (no merge) keeps the cheap single-footer behavior."""
    import os

    from jcf_nb_migration_spark.io.readers import read_parquet

    d = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id bigint, name string") \
        .write.parquet(os.path.join(d, "shard=old"))
    spark.createDataFrame([(2, "b", 9.5)],
                          "id bigint, name string, score double") \
        .write.parquet(os.path.join(d, "shard=new"))

    merged = read_parquet(spark, d, merge_schema=True)
    assert set(merged.columns) == {"id", "name", "score", "shard"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None and rows[2].score == 9.5
