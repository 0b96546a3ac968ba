"""Empirical scaling probe: time representative heavy operators at
sf0.01 and sf0.1 (10x the rows) in one session and report the
runtime ratio. A ~linear operator should land well under 10x wall
clock on local[32] (fixed overheads amortize; parallelism absorbs
data growth); a quadratic one would blow past it.

Third point (--third-point, VERDICT r5 item 4 / r6 item 5): the
fixtures stop at sf0.1, so a ~sf0.3 dataset is DERIVED — every table
from sf0.1 unioned three times with replica-offset keys:

- documents: replicas 2/3 get offset doc_ids and a deterministic vowel
  permutation over the text. The permutation preserves document
  lengths, token boundaries, and each replica's INTERNAL duplicate
  structure while killing most cross-replica shingle overlap, so a
  pair-producing operator sees ~3x the true pairs, not ~9x replica
  cross-talk. Residual caveat: documents whose text contains no vowels
  (or is empty) are byte-identical across replicas, so a small number
  of cross-replica duplicate pairs survive — the recorded output
  counts absorb this (it is why pair counts can land slightly above
  exactly-3x, not evidence of superlinear compute).
- embeddings: offset vec_ids; replicas 2/3 multiply the vector by a
  deterministic ±1 sign pattern (alternating every 1 / every 2 dims).
  Sign patterns are norm-preserving, keep every WITHIN-replica cosine
  exactly (cos(v·s, u·s) = cos(v, u), so each replica's internal
  near-dup structure replicates intact) and suppress CROSS-replica
  similarity (cos(v, u·s) ≈ 0 for smooth/autocorrelated vectors — a
  circular rotation, tried first, left the synthetic vectors'
  autocorrelation largely intact and produced ~9x cross-replica pairs
  on 3x data).
- customer/orders/lineitem/part/supplier: entity keys (custkey,
  orderkey, partkey, suppkey) offset per replica so referential
  structure is preserved within each replica; nationkey/regionkey are
  left alone so the bounded dims still join.
- events: event_id/user_id offset (per-user event sequences replicate
  intact, tripling user count at the same per-user density).
- nation/region: bounded dims, copied as-is.

A three-point curve separates output-bound growth from superlinear
compute: for each probed query the output row count at every point is
recorded as evidence, and the 0.3d/0.1 ratio should stay near the 3x
data factor as the 0.1/0.01 ratio stays near 10x. Every registered
query is third-point-eligible (the derived dir carries all 10 tables).

Fourth point (--fourth-point): same construction with TEN replicas of
sf0.1 — a derived ~sf1 (~100x the sf0.01 rows). Each replica gets a
distinct vowel permutation / sign-pattern period, so every PAIR of
replicas is decorrelated, not just each replica vs the original. A
four-point curve (0.01 → 0.1 → 0.3d → 1.0d, 100x end to end) is the
strongest local evidence that a plan's growth is output-bound: the
1.0d/0.1 wall-clock ratio should land well under the 10x data factor
on local[32] while recorded output rows track the data factor.

Usage: PYTHONPATH=. python tools/scaling_probe.py \
           [--third-point] [--fourth-point] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

DEFAULT = ["minhash_lsh_dedup", "decontaminate_ngrams", "dedup_exact",
           "paragraph_dedup", "doc_containment_pairs",
           "trigram_backoff_score", "curation_pipeline_e2e",
           "simhash_near_pairs", "embedding_dedup_pairs",
           "knn_ann_label_propagation", "duplicate_spans",
           "linkgraph_pagerank", "bm25_top_docs", "sequence_packing",
           # r10 serving-mutation + co-bucketed surfaces, watched
           # per-round like the rest of the heavy list
           "bm25_tombstone_served", "docstore_upsert_fetch",
           "cobucketed_order_revenue", "bm25_batch_served",
           # r10 cont. 6: SSSP / skyline / time travel / z-order
           "linkgraph_khop_sssp", "doc_pareto_frontier",
           "docstore_as_of_fetch", "docstore_change_feed",
           "lineitem_zorder_pruned",
           # r11 additions
           "semantic_decontamination_ann", "lineitem_zorder_asof",
           "media_perceptual_dedup"]

# the bench headline set (VERDICT r6 item 5: full three-point table)
HEADLINE = ["asof_click_before_error", "ann_brute_force_topk",
            "embedding_dedup_pairs", "doc_token_stats", "dedup_exact",
            "minhash_lsh_dedup", "local_supplier_volume",
            "shipping_priority", "returned_item_report",
            "decontaminate_ngrams", "pricing_summary",
            "forecast_revenue", "latest_event_per_user",
            "retrieval_pipeline_e2e"]

# --third-point with no explicit queries probes the headline set
THIRD_POINT_DEFAULT = HEADLINE

_FIXTURES_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".probe_fixtures")
DERIVED_DIR = os.path.join(_FIXTURES_ROOT, "sf0.3_full")
DERIVED10_DIR = os.path.join(_FIXTURES_ROOT, "sf1_full")
DERIVED30_DIR = os.path.join(_FIXTURES_ROOT, "sf3_full")
_ID_OFF = 10_000_000

# nine pairwise-distinct vowel permutations (replicas 1..9): any two
# replicas' texts differ wherever the source text has a vowel the two
# permutations map differently, so CROSS-replica shingle overlap dies
# between every pair, while lengths / token boundaries / each
# replica's internal duplicate structure are preserved
_PERMS = ["uoiea", "eioua", "iouae", "ouaei", "uaeio",
          "aeuio", "eaiou", "oiuea", "uieao"]

# per-table bigint key columns offset per replica (referential keys
# move together; bounded-dim keys n_nationkey/r_regionkey do not move)
_KEY_COLS = {
    "documents": ["doc_id"],
    # label offsets too: it is the BLOCKING key of embedding_dedup_pairs
    # (and a class id elsewhere) — tripling members per block would grow
    # candidate pairs ~9x on 3x data by construction; offsetting gives
    # 3x blocks of the original size, the shape a production blocking
    # key (cluster/LSH bucket/shard) keeps at scale
    "embeddings": ["vec_id", "label"],
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "nation": [],
    "region": [],
}


def _replica(src, table: str, i: int, perm: str):
    """Replica i (1..9) of one sf0.1 table: keys offset, content
    deterministically permuted where cross-replica overlap would
    otherwise fake duplicate pairs. The sign-pattern period scales
    with i, so every pair of replicas gets distinct patterns."""
    from pyspark.sql import functions as F

    cols = []
    for c in src.columns:
        col = F.col(c)
        if c in _KEY_COLS[table]:
            col = (col + i * _ID_OFF).cast(src.schema[c].dataType)
        elif table == "documents" and c == "text":
            col = F.translate(col, "aeiou", perm)
        elif table == "embeddings" and c == "embedding":
            # ±1 sign pattern (period 2 / 4): norm- and within-replica-
            # cosine-preserving, cross-replica decorrelating
            col = F.transform(
                col, lambda x, j: F.when((j / i).cast("int") % 2 == 0,
                                         x).otherwise(-x))
        cols.append(col.alias(c))
    return src.select(*cols)


def _ensure_derived(spark, out_dir: str, replicas: int) -> str:
    """Build (once) a derived fixture dir of `replicas` x sf0.1 —
    ALL tables, replica keys offset, content decorrelated pairwise."""
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    for table in _KEY_COLS:
        src = spark.read.parquet(
            f"/root/testdata/sf0.1/{table}.parquet")
        if _KEY_COLS[table]:  # replicate with offset keys
            reps = [src]
            for i in range(1, replicas):
                reps.append(_replica(src, table, i, _perm_for(i)))
            df = reps[0]
            for r in reps[1:]:
                df = df.unionByName(r)
        else:  # bounded dim: copy as-is
            df = src
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{table}.parquet"))
    open(marker, "w").close()
    return out_dir


def ensure_derived_sf03(spark) -> str:
    """Derived ~sf0.3 (3 replicas of sf0.1)."""
    return _ensure_derived(spark, DERIVED_DIR, 3)


def ensure_derived_sf1(spark) -> str:
    """Derived ~sf1 (10 replicas of sf0.1 — 100x the sf0.01 rows)."""
    return _ensure_derived(spark, DERIVED10_DIR, 10)


def ensure_derived_sf3(spark) -> str:
    """Derived ~sf3 (30 replicas of sf0.1) — the parallel-scaling leg's
    fixture (tools/scaling_leg.py): at 10x the 32-core walls are still
    fixed-cost-bound (stage scheduling + planning ~1-1.5 s dwarfs the
    compute), so the 8-vs-32-core ratio cannot show the operators
    parallelize; 30x gives the compute side enough weight. Replicas
    beyond the 9 hand-picked permutations draw from the deterministic
    pairwise-distinct non-identity permutation sequence below — the
    same decorrelation property (texts differ wherever the source has
    a vowel the two permutations map differently)."""
    return _ensure_derived(spark, DERIVED30_DIR, 30)


def _perm_for(i: int) -> str:
    """Permutation for replica i (1-based): the hand-picked nine
    first (unchanged — sf0.3_full/sf1_full bytes stay identical), then
    deterministic lexicographic non-identity permutations of 'aeiou'
    not already used."""
    if i <= len(_PERMS):
        return _PERMS[i - 1]
    import itertools
    seen = set(_PERMS) | {"aeiou"}
    seq = ("".join(p) for p in itertools.permutations("aeiou")
           if "".join(p) not in seen)
    for k, p in enumerate(seq, start=len(_PERMS) + 1):
        if k == i:
            return p
    raise ValueError(f"no permutation left for replica {i}")


def main() -> int:
    args = [a for a in sys.argv[1:]
            if a not in ("--third-point", "--fourth-point")]
    fourth = "--fourth-point" in sys.argv[1:]
    third = "--third-point" in sys.argv[1:] or fourth
    names = args or (THIRD_POINT_DEFAULT if third else DEFAULT)
    from jcf_nb_migration_spark import get_spark
    from jcf_nb_migration_spark.registry import all_queries

    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    points = [("0.01", "/root/testdata/sf0.01"),
              ("0.1", "/root/testdata/sf0.1")]
    if third:
        points.append(("0.3d", ensure_derived_sf03(spark)))
    if fourth:
        points.append(("1.0d", ensure_derived_sf1(spark)))
    out = {}
    for name in names:
        row = {}
        for sf, sf_dir in points:
            best = float("inf")
            for _ in range(2):  # best-of-2: drop plan-compile cost
                t0 = time.time()
                qs[name].fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                best = min(best, time.time() - t0)
            if third:
                row[f"rows_{sf}"] = qs[name].fn(spark, sf_dir).count()
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            row[sf] = round(best, 3)
        row["ratio_10x_data"] = round(row["0.1"] / row["0.01"], 2)
        if third:
            row["ratio_3x_data"] = round(row["0.3d"] / row["0.1"], 2)
        if fourth:
            row["ratio_10x_derived"] = round(row["1.0d"] / row["0.1"], 2)
        out[name] = row
        print(json.dumps({name: row}))
    print(json.dumps({"summary": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
