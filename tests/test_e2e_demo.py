"""The examples/migration_demo.py E2E workflow (file-in → file-out,
every sink) as a test: the reference's whole run() lifecycle."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_demo_end_to_end(spark, tmp_path):
    from examples.migration_demo import main

    outputs = main(str(tmp_path))
    out_lines = open(outputs["output"]).read().splitlines()
    # "Vol Interest" is a tag-only trigger column: it passes through to
    # the sink (reference mapColumns skips Tag? rows, main.py:528-541).
    assert out_lines[0] == ("email,first_name,last_name,join_date,faith,"
                            "notes,constituency,Vol Interest,phone,tags")
    assert len(out_lines) == 5           # 5 rows - 1 purged + header
    assert any("03/07/2019" in l for l in out_lines)      # date rewrite
    assert any('"555, 556"' in l for l in out_lines)      # concat merge
    deleted = open(outputs["deleted"]).read()
    assert "e2@x" in deleted and "Test row" in deleted    # purge audit
    assert open(outputs["faith"]).read().splitlines()[1:] == ["Christianity"]
    audit = open(outputs["concat_audit"]).read()
    assert "e5@x" in audit
    assert open(outputs["diff_data_missing"]).read().splitlines()[1:] == \
        ["Mystery"]


def test_corpus_curation_pipeline(spark, tmp_path):
    """The composed training-corpus pipeline (filter → dedup →
    cluster-keep-one → split → budget → shards) runs end-to-end and
    every stage only ever removes rows."""
    from examples.corpus_pipeline import curate

    out = curate(spark, "/root/testdata/sf0.001", str(tmp_path))
    s = out["stages"]
    order = ["input", "after_lang_filter", "after_quality_filter",
             "after_exact_dedup", "after_near_dedup"]
    for a, b in zip(order, order[1:]):
        assert s[b] <= s[a], (a, b, s)
    assert s["train"] + s["holdout"] == s["after_near_dedup"]
    assert out["train_subwords"] >= out["train_words"] > 0

    train = spark.read.json(str(tmp_path / "train_jsonl"))
    holdout = spark.read.parquet(str(tmp_path / "holdout_parquet"))
    assert train.count() == s["train"]
    assert holdout.count() == s["holdout"]
    # disjoint, deterministic split
    both = train.select("doc_id").intersect(holdout.select("doc_id"))
    assert both.count() == 0


def test_retrieval_serving_demo(spark, tmp_path):
    """examples/retrieval_serving.py: the build/serve/ingest/maintain
    lifecycle runs end-to-end and every probe family returns hits."""
    from examples.retrieval_serving import serve_demo
    from tests.conftest import SF_SMALL

    s = serve_demo(spark, SF_SMALL, str(tmp_path / "idx"))
    assert s["appended"] == [True]
    assert s["compacted"] is True  # forced-low threshold after append
    assert len(s["bm25_top"]) == 10
    # every ranked id's content comes back from the docstore
    assert sorted(d for d, _ in s["fetched"]) == sorted(
        d for d, _ in s["bm25_top"])
    assert len(s["phrase_hits"]) > 0
    assert len(s["proximity_hits"]) > 0
    # r10 mutation phase: the correction is served, the purged doc is
    # out of ranking AND out of the content store, vacuum reclaimed it
    assert s["fixed_text"].startswith("v2: ")
    assert s["purged_still_ranked"] is False
    assert s["purged_content_rows"] == 0
    assert s["vacuum"]["reclaimed_docs"] == 1


def test_lakehouse_lifecycle_demo(spark, tmp_path):
    """examples/lakehouse_lifecycle.py: versioned mutations, time
    travel, CDC-driven view maintenance, audited rollback, retention,
    and the z-ordered pruned scan — end-to-end on the small fixture."""
    from examples.lakehouse_lifecycle import lakehouse_demo

    from tests.conftest import SF_SMALL

    s = lakehouse_demo(spark, SF_SMALL, str(tmp_path / "lk"))
    assert s["versions"] == 2
    assert s["history"] == [(0, "build"), (1, "upsert"), (2, "delete")]
    assert s["live_has_victim"] is False and s["v0_has_victim"] is True
    assert s["feed_counts"]["delete"] > 0
    assert s["feed_counts"]["update"] > 0
    assert s["view_matches_reprojection"] is True
    assert s["restored_version"] == 3 and s["victim_back"] is True
    assert s["z_rows"] == s["z_rows_expected"] > 0
    assert 0 < s["z_files"][0] < s["z_files"][1]
    # r11: z-layout lifecycle (append -> maintain -> restore, AS-OF)
    assert s["z_maintained"] is True
    assert s["z_v1_rows"] == s["z_v0_rows"] + 2000
    assert s["z_live_equals_v0"] is True
    assert s["z_history"] == [(0, "build"), (1, "append"),
                              (2, "maintain"), (3, "restore")]
    # r11 cont.: serving-index commit point around destructive vacuum
    assert s["lex_vacuum_changed_probe"] is True
    assert s["lex_restore_matches_commit_point"] is True
    assert s["lex_snapshots"] == [(0, "pre-maintenance")]
