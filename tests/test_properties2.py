"""Second property-based wave (SURVEY.md §5 strategy #4): algebraic
invariants of the distributed kernels against brute-force pure-Python
references — skyline exactness across Arrow batch boundaries, z-order
pruning soundness under random predicates, LSH precision (emitted
pairs are a subset of the exact all-pairs result, with exact Jaccard
values), and upsert/SCD2 merge algebra. Batched like
test_properties.py: hypothesis generates row sets, one Spark job
evaluates each example."""

import os
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings, strategies as st

SETTINGS = dict(max_examples=15, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])
SMALL = dict(SETTINGS, max_examples=6)


# ---------------------------------------------------------------- skyline

def _brute_skyline(points):
    """O(n²) reference: keep p unless some q is ≥ on every dim and >
    on at least one (duplicates of a frontier point all survive)."""
    out = []
    for i, p in enumerate(points):
        dominated = any(
            all(qv >= pv for qv, pv in zip(q, p))
            and any(qv > pv for qv, pv in zip(q, p))
            for j, q in enumerate(points) if j != i)
        if not dominated:
            out.append(p)
    return sorted(out)


@given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 6),
                          st.integers(0, 6)),
                min_size=1, max_size=60),
       st.integers(min_value=1, max_value=5))
@settings(**SETTINGS)
def test_skyline_matches_bruteforce_across_batches(spark, pts, nparts):
    """Exact + partitioning-invariant, with the Arrow batch size forced
    tiny so the global pass folds MULTIPLE batches (the r11 cross-batch
    dominance fix is on the hot path, not dormant)."""
    from jcf_nb_migration_spark.functions.skyline import skyline

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prev = spark.conf.get(key)
    spark.conf.set(key, "4")
    try:
        df = spark.createDataFrame(pts, "x int, y int, z int") \
                  .repartition(nparts)
        got = sorted((r["x"], r["y"], r["z"])
                     for r in skyline(df, ["x", "y", "z"]).collect())
    finally:
        spark.conf.set(key, prev)
    assert got == _brute_skyline(pts)


# ---------------------------------------------------------------- z-order

@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)),
                min_size=1, max_size=80),
       st.tuples(st.integers(0, 50), st.integers(0, 50)),
       st.tuples(st.integers(0, 50), st.integers(0, 50)))
@settings(**SMALL)
def test_zorder_pruning_soundness(spark, rows, xr, yr):
    """File pruning must be invisible: a pruned scan under random
    range predicates returns exactly the rows a full scan + filter
    returns, and the survivor count never exceeds the total."""
    from jcf_nb_migration_spark.io.zorder import (
        write_zordered, zordered_scan, zordered_file_count)

    xlo, xhi = min(xr), max(xr)
    ylo, yhi = min(yr), max(yr)
    path = tempfile.mkdtemp(prefix="zprop_")
    try:
        df = spark.createDataFrame(
            [(i, x, y) for i, (x, y) in enumerate(rows)],
            "id int, x int, y int")
        write_zordered(df, path, ["x", "y"], n_files=4)
        ranges = {"x": (xlo, xhi), "y": (ylo, yhi)}
        got = sorted(
            (r["id"], r["x"], r["y"])
            for r in zordered_scan(spark, path, ranges).collect())
        want = sorted((i, x, y) for i, (x, y) in enumerate(rows)
                      if xlo <= x <= xhi and ylo <= y <= yhi)
        assert got == want
        kept, total = zordered_file_count(spark, path, ranges)
        assert 0 <= kept <= total
    finally:
        shutil.rmtree(path, ignore_errors=True)


# ------------------------------------------------------------------- LSH

WORD = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
TEXT = st.lists(WORD, min_size=2, max_size=8).map(" ".join)


@given(st.lists(TEXT, min_size=2, max_size=15))
@settings(**SETTINGS)
def test_lsh_pairs_subset_of_exact(spark, texts):
    """The verify step makes LSH precision exact: every emitted pair
    must appear in the brute-force all-pairs result with the SAME
    Jaccard value (banding may lose recall, never precision)."""
    from jcf_nb_migration_spark.functions.dedup import (
        jaccard_pairs, minhash_lsh_dedup)

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string")
    exact = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9)
             for r in jaccard_pairs(df, "id", "text",
                                    threshold=0.3, n=2).collect()}
    lsh = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9)
           for r in minhash_lsh_dedup(df, "id", "text", threshold=0.3,
                                      n=2).collect()}
    for pair, j in lsh.items():
        assert pair in exact and exact[pair] == j, (pair, j)


# ---------------------------------------------------------- upsert / SCD2

KEYS = st.integers(0, 5)
VALS = st.integers(0, 99)


def _last_wins(updates):
    out = {}
    for k, v in updates:
        out[k] = v
    return out


@given(st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=8),
       st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=8),
       st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=8))
@settings(**SETTINGS)
def test_upsert_algebra(spark, base, u1, u2):
    """upsert(upsert(b, u1), u2) == upsert(b, last-wins(u1 ∪ u2)), and
    re-applying a batch is idempotent — the relational MERGE emulation
    matches the dict semantics exactly."""
    from jcf_nb_migration_spark.functions.upsert import upsert

    base = list(_last_wins(base).items())       # unique keys in base
    u1 = list(_last_wins(u1).items())
    u2 = list(_last_wins(u2).items())
    mk = lambda rows: spark.createDataFrame(
        rows or [(None, None)], "k int, v int").where("k is not null")
    seq = upsert(upsert(mk(base), mk(u1), "k"), mk(u2), "k")
    merged_updates = list(_last_wins(u1 + u2).items())
    one = upsert(mk(base), mk(merged_updates), "k")
    as_dict = lambda df: {r["k"]: r["v"] for r in df.collect()}
    want = _last_wins(base + u1 + u2)
    assert as_dict(seq) == want
    assert as_dict(one) == want
    again = upsert(seq, mk(u2), "k")
    assert as_dict(again) == want


@given(st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=8),
       st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=8))
@settings(**SETTINGS)
def test_scd2_invariants(spark, base, updates):
    """SCD2 never loses rows (|out| = |base| + |updates|), gives every
    updated key exactly one current row with the update's value, and
    leaves untouched keys byte-identical."""
    from jcf_nb_migration_spark.functions.upsert import scd2_merge

    base = list(_last_wins(base).items())
    updates = list(_last_wins(updates).items())
    bdf = spark.createDataFrame(
        [(k, v, "2024-01-01", True) for k, v in base],
        "k int, v int, eff string, is_current boolean")
    udf_ = spark.createDataFrame(
        [(k, v, "2024-06-01") for k, v in updates],
        "k int, v int, eff string")
    out = scd2_merge(bdf, udf_, "k", "eff",
                     new_effective="2024-06-01").collect()
    assert len(out) == len(base) + len(updates)
    upd = dict(updates)
    cur = [(r["k"], r["v"]) for r in out if r["is_current"]]
    assert sorted(k for k, _ in cur) == sorted(
        set(upd) | {k for k, _ in base if k not in upd})
    for k, v in cur:
        if k in upd:
            assert v == upd[k]
    closed = [(r["k"], r["v"]) for r in out if not r["is_current"]]
    assert sorted(closed) == sorted(
        (k, v) for k, v in base if k in upd)


# ------------------------------------------------- snapshot lifecycle

_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"),
                  st.lists(st.integers(0, 4), min_size=1, max_size=3)),
        st.tuples(st.just("delete"),
                  st.lists(st.integers(1, 40), min_size=1, max_size=4)),
        st.tuples(st.just("vacuum"), st.just(None)),
        st.tuples(st.just("compact"), st.just(None)),
        st.tuples(st.just("snapshot"), st.just(None)),
        st.tuples(st.just("restore"), st.integers(0, 10)),
    ),
    min_size=1, max_size=7)

_SNAP_SEQ = 0


@given(_OPS)
@settings(**SMALL)
def test_lexical_snapshot_model(spark, ops):
    """Model-based fuzz of the serving-index commit points: under ANY
    interleaving of append / delete / vacuum / compact / snapshot /
    restore, every snapshot ever taken must restore to the exact probe
    result captured when it was taken (file-level COW means no later
    op may invalidate a held commit point)."""
    global _SNAP_SEQ
    _SNAP_SEQ += 1
    from jcf_nb_migration_spark.functions import text as T
    from jcf_nb_migration_spark.io.lexical import (
        bm25_probe, lexical_index_append, lexical_index_build,
        lexical_index_delete, lexical_index_restore,
        lexical_index_snapshot, lexical_index_vacuum,
        lexical_index_compact)

    prefix = f"snapmodel_{_SNAP_SEQ}"
    path = tempfile.mkdtemp(prefix="lexmodel_") + "/idx"
    vocab = ["spark", "window", "merge", "alpha", "beta"]

    def toks(rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        return df.select("doc_id", T.tokens("text").alias("w"))

    def probe():
        return [(r["doc_id"], r["bm25"]) for r in
                bm25_probe(spark, prefix, path,
                           ("spark", "window", "merge"),
                           1.2, 0.75, k=15).collect()]

    base = [(i, " ".join(vocab[(i + j) % 5] for j in range(1 + i % 4)))
            for i in range(1, 9)]
    lexical_index_build(toks(base), prefix, path, num_buckets=4)
    next_id = 100
    batch_seq = 0
    captured = {}  # sid -> probe rows at snapshot time
    try:
        for op, arg in ops:
            if op == "append":
                batch_seq += 1
                rows = [(next_id + k,
                         " ".join(vocab[(next_id + k + j) % 5]
                                  for j in range(1 + (next_id + k) % 3)))
                        for k in range(len(arg))]
                next_id += len(arg)
                lexical_index_append(toks(rows), prefix, path,
                                     num_buckets=4,
                                     batch_id=f"b{batch_seq}")
            elif op == "delete":
                batch_seq += 1
                lexical_index_delete(spark, prefix, path, arg,
                                     num_buckets=4,
                                     batch_id=f"d{batch_seq}")
            elif op == "vacuum":
                lexical_index_vacuum(spark, prefix, path, num_buckets=4)
            elif op == "compact":
                lexical_index_compact(spark, prefix, path,
                                      num_buckets=4)
            elif op == "snapshot":
                sid = lexical_index_snapshot(spark, prefix, path,
                                             num_buckets=4)
                captured[sid] = probe()
            elif op == "restore":
                if captured:
                    sids = sorted(captured)
                    sid = sids[arg % len(sids)]
                    lexical_index_restore(spark, prefix, path, sid,
                                          num_buckets=4)
                    assert probe() == captured[sid], (sid, ops)
        # final sweep: every commit point still restores exactly
        for sid in sorted(captured):
            lexical_index_restore(spark, prefix, path, sid,
                                  num_buckets=4)
            assert probe() == captured[sid], (sid, ops)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_postings")
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)


# -------------------------------------------------------------------- BPE

_BPE_WORDS = st.sampled_from(["ab", "aab", "abb", "ba", "bb", "a",
                              "abab"])
_BPE_DOC = st.lists(_BPE_WORDS, min_size=1, max_size=6).map(" ".join)


def _py_bpe(syms, merges):
    """Reference BPE application: each merge in rank order, greedy
    left-to-right non-overlapping within one pretoken."""
    for lhs, rhs in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                out.append(lhs + rhs)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


@given(st.lists(_BPE_DOC, min_size=1, max_size=6))
@settings(**SMALL)
def test_bpe_apply_matches_python_reference(spark, docs):
    """The codegen'd delimiter-encoded replace chain
    (bpe_doc_encode + bpe_apply_merges) must produce EXACTLY the
    per-pretoken symbol sequences the textbook greedy BPE gives for
    the merges bpe_train learned on the same corpus — the flat string
    replace may never merge across pretoken boundaries or deviate
    from left-to-right non-overlap."""
    from pyspark.sql import functions as F

    from jcf_nb_migration_spark.functions.text import (
        BPE_END, BPE_SYM, BPE_TOK, bpe_apply_merges, bpe_doc_encode,
        bpe_train, subword_tokens)

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id int, text string")
    merges = bpe_train(df, "text", num_merges=6)
    rows = df.select(
        "doc_id",
        bpe_apply_merges(bpe_doc_encode(F.col("text")), merges)
        .alias("enc"),
        subword_tokens(F.col("text")).alias("pre")).collect()
    for r in rows:
        got = [[s.rstrip(BPE_END) for s in tok.split(BPE_SYM) if s]
               for tok in r["enc"].split(BPE_TOK) if tok]
        want = [_py_bpe(list(p), merges) for p in r["pre"]]
        assert got == want, (r["pre"], merges)


# ------------------------------------------------------------------- SSSP

_EDGE = st.tuples(st.integers(0, 7), st.integers(0, 7),
                  st.integers(1, 9))


def _py_dijkstra(edges, src):
    """Reference shortest paths (integer weights ≥ 1)."""
    import heapq

    adj = {}
    for u, v, w in edges:
        adj.setdefault(u, []).append((v, w))
    dist = {src: 0}
    heap = [(0, src)]
    while heap:
        d, n = heapq.heappop(heap)
        if d > dist.get(n, float("inf")):
            continue
        for v, w in adj.get(n, []):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    return dist


@given(st.lists(_EDGE, min_size=1, max_size=16))
@settings(**SMALL)
def test_sssp_fixpoint_matches_dijkstra(spark, edges):
    """The certified-fixpoint distributed Bellman-Ford must agree with
    Dijkstra on every random directed weighted graph — including
    self-loops, parallel edges, and nodes unreachable from the
    source (absent from both results)."""
    from jcf_nb_migration_spark.functions.graph import sssp

    df = spark.createDataFrame(edges, "u int, v int, w int")
    src = spark.createDataFrame([(edges[0][0],)], "node int")
    got = {r["node"]: r["dist"] for r in sssp(df, src).collect()}
    assert got == _py_dijkstra(edges, edges[0][0])


# -------------------------------------------------------------------- LPA

def _py_lpa(pairs, rounds=3):
    adj = {}
    for a, b in pairs:
        if a == b:
            adj.setdefault(a, [])
            continue
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n, nbrs in adj.items():
            if not nbrs:
                nxt[n] = labels[n]
                continue
            counts = {}
            for m in nbrs:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            nxt[n] = min(counts, key=lambda l: (-counts[l], l))
        labels = nxt
    return labels


@given(st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)),
                min_size=1, max_size=20),
       st.integers(1, 4))
@settings(**SMALL)
def test_label_propagation_matches_reference(spark, pairs, nparts):
    """Fixed-round deterministic LPA is a pure function of the edge
    set: equals the plain-Python synchronous reference (neighbor
    majority, smallest-label ties) on random multigraphs with
    self-loops, at any input partitioning. Distinct-edge semantics:
    the distributed op works on the DISTINCT undirected pair set, so
    the reference dedups parallel edges the same way."""
    from jcf_nb_migration_spark.functions.graph import label_propagation

    # the engine consumes a (u, v) PAIR frame; parallel edges and
    # self-loops may appear — dedup to the canonical undirected set,
    # like _rare_gram_pairs (SELECT DISTINCT u < v) produces
    canon = sorted({(min(a, b), max(a, b)) for a, b in pairs
                    if a != b})
    if not canon:
        return  # all self-loops: the operator has no edge to work on
    df = (spark.createDataFrame(canon, "u int, v int")
          .repartition(nparts))
    got = {r["node"]: r["label"] for r in
           label_propagation(df, rounds=3).collect()}
    assert got == _py_lpa(canon, rounds=3)


# -------------------------------------------------------------- winnowing

_LOW = st.text(alphabet="abcd", min_size=0, max_size=20)
_PLANT = st.text(alphabet="abcd", min_size=11, max_size=25)  # ≥ k+w-1
_DISJOINT = st.text(alphabet="efgh", min_size=12, max_size=30)


@given(_LOW, _LOW, _LOW, _LOW, _PLANT, _DISJOINT)
@settings(**SMALL)
def test_winnowing_detection_guarantee(spark, a1, a2, b1, b2, plant,
                                       other):
    """The MOSS winnowing theorem, as a property: two documents
    sharing ANY substring of length ≥ k + window - 1 (here 8+4-1=11)
    must share at least one fingerprint, wherever the substring sits;
    and a document over a disjoint alphabet (no common k-gram at all)
    shares none (fingerprints are k-gram hashes)."""
    from jcf_nb_migration_spark.functions.text import (
        winnowing_fingerprints)

    df = spark.createDataFrame(
        [(1, a1 + plant + a2), (2, b1 + plant + b2), (3, other)],
        "id int, text string")
    fps = {}
    for r in winnowing_fingerprints(df, "id", "text").collect():
        fps.setdefault(r["id"], set()).add(r["fp"])
    assert fps[1] & fps[2], (plant, a1, a2, b1, b2)
    assert not (fps[1] & fps.get(3, set()))


# ------------------------------------------------------------------- skew

@given(st.lists(st.tuples(st.integers(0, 3),
                          st.integers(-100, 100)),
                min_size=1, max_size=30),
       st.integers(1, 8))
@settings(**SMALL)
def test_salted_aggregate_equals_plain_groupby(spark, rows, n_salts):
    """Salting is invisible to the result: the two-phase (key, salt)
    aggregation must equal the plain groupBy EXACTLY for any salt
    count — sums run in decimal, so how rows split across salts can
    never show through (the retry-double-count guard is deterministic
    salting, also exercised here by construction)."""
    from jcf_nb_migration_spark.functions.skew import salted_aggregate

    df = spark.createDataFrame(rows, "k int, v int")
    got = {(r["k"]): (r["sum_v"], r["n"]) for r in
           salted_aggregate(df, "k", "v", n_salts=n_salts).collect()}
    want = {}
    for k, v in rows:
        s, n = want.get(k, (0, 0))
        want[k] = (s + v, n + 1)
    assert got == {k: (float(s), n) for k, (s, n) in want.items()}


@given(st.lists(st.tuples(st.integers(0, 3), st.integers(1, 100)),
                min_size=1, max_size=20),
       st.lists(st.tuples(st.integers(0, 3), st.integers(1, 100)),
                min_size=1, max_size=20))
@settings(**SMALL)
def test_salted_join_equals_plain_join(spark, big, small):
    """salted_join must produce exactly the plain equi-join's row
    multiset (salting replicates the small side; no row may be lost
    or duplicated)."""
    from jcf_nb_migration_spark.functions.skew import salted_join

    b = spark.createDataFrame(big, "k int, bv int")
    s = spark.createDataFrame(
        [(k, v) for k, v in {kv[0]: kv for kv in small}.values()],
        "k int, sv int")  # unique small-side keys (dimension table)
    got = sorted((r["k"], r["bv"], r["sv"]) for r in
                 salted_join(b, s, "k", n_salts=4).collect())
    want = sorted((r["k"], r["bv"], r["sv"]) for r in
                  b.join(s, "k").collect())
    assert got == want
