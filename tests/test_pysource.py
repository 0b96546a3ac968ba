"""Plumbing tests for the custom Python Data Source (io/pysource.py):
partition planning, schema, executor-side generation, determinism.
The cross-engine value gate is pysource_synthdocs in
tests/test_query_oracles.py."""

from jcf_nb_migration_spark.io import pysource as PS


def test_partition_planning():
    r = PS.SynthDocsReader({"n": "100", "parts": "8"})
    parts = r.partitions()
    assert len(parts) == 8
    # contiguous, disjoint, covering [0, 100)
    spans = sorted((p.start, p.end) for p in parts)
    assert spans[0][0] == 0 and spans[-1][1] == 100
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b == c
    # degenerate: more parts than rows still covers everything once
    tiny = PS.SynthDocsReader({"n": "3", "parts": "8"}).partitions()
    ids = [i for p in tiny for i, _, _ in map(PS.synth_doc,
                                              range(p.start, p.end))]
    assert ids == [0, 1, 2]


def test_generator_contract():
    doc_id, n_words, text = PS.synth_doc(7)
    assert doc_id == 7
    words = text.split(" ")
    assert len(words) == n_words
    assert all(len(w) == PS.WORD_HEX for w in words)
    assert PS.WORDS_MIN <= n_words < PS.WORDS_MIN + PS.WORDS_MOD
    # deterministic
    assert PS.synth_doc(7) == (doc_id, n_words, text)


def test_read_through_spark(spark):
    assert PS.register_synthdocs(spark)
    df = (spark.read.format("synthdocs")
          .option("n", 50).option("parts", 4).load())
    assert df.schema.simpleString() == \
        "struct<doc_id:bigint,n_words:int,text:string>"
    rows = {r["doc_id"]: r for r in df.collect()}
    assert sorted(rows) == list(range(50))
    # executor-side rows match the driver-side generator contract
    for did in (0, 17, 49):
        assert (rows[did]["doc_id"], rows[did]["n_words"],
                rows[did]["text"]) == PS.synth_doc(did)
    # physical parallelism follows the partition plan
    assert df.rdd.getNumPartitions() == 4
