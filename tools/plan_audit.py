"""Generate PLANS.md: formatted physical plans for the headline
queries with scale commentary — the .explain audit SURVEY.md §4 calls
for, kept as a reviewable artifact.

Usage: PYTHONPATH=. python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

COMMENTARY = {
    "pricing_summary": (
        "Filter pushed to the parquet scan (PushedFilters), 6-column "
        "ReadSchema (297-column-proof pruning), partial+final "
        "HashAggregate around one exchange — shuffle carries "
        "|groups|x|partitions| rows only."),
    "shipping_priority": (
        "TPC-H Q3: date filters pushed to both fact scans, the "
        "segment-filtered customer dimension broadcast (planner-"
        "chosen, no forced hint), top-20 via TakeOrderedAndProject — "
        "no global sort materialized."),
    "returned_item_report": (
        "TPC-H Q10: returnflag/date filters pushed down; customer "
        "join strategy left to the planner/AQE (broadcast while "
        "small — no forced hint on an SF-proportional dimension), "
        "nation broadcast."),
    "simhash_near_pairs": (
        "Pigeonhole-banded near-pair search: band explode + "
        "equi-join on (band_idx, band_val) + exact-Hamming verify — "
        "no CartesianProduct/BroadcastNestedLoopJoin in the plan."),
    "local_supplier_volume": (
        "Six-table star join: every dimension broadcast, "
        "nation-equality evaluated as a residual on the broadcast "
        "supplier join; one fact shuffle total."),
    "minhash_lsh_dedup": (
        "Candidate generation is an equi-join on (band_idx, "
        "band_hash) — no cartesian pair enumeration anywhere; "
        "verification joins only candidate pairs."),
    "embedding_dedup_pairs": (
        "Blocked pair join on label (equi), cosines from precomputed "
        "norms — N folds for norms, one dot per surviving pair."),
    "asof_click_before_error": (
        "As-of join as union + one window over user_id: a single "
        "shuffle, no per-group Python, no range explosion."),
    "decontaminate_ngrams": (
        "Benchmark decontamination: distinct 5-gram explode, LEFT "
        "equi-join on the n-gram string against the benchmark set "
        "(AQE broadcasts it — benchmark-suite-sized, no forced hint), "
        "one per-doc count aggregation; linear in corpus size, no "
        "pairwise stage."),
    "retrieval_pipeline_e2e": (
        "Hybrid retrieval (r7): quality gate pushed into the "
        "documents scans; BM25's only corpus shuffle is the "
        "(doc_id, tok) tf groupBy, with df + scalar stats broadcast "
        "(the sole 1-row nested loop); the ANN shortlist is a bucket "
        "EQUI-join of the 7 multiprobe LSH buckets — never a corpus "
        "scan; both lists TakeOrdered, fusion and metadata join-back "
        "k-vs-k."),
    "regional_min_balance_supplier": (
        "TPC-H Q2 shape (r7): the correlated scalar-MIN subquery "
        "decorrelated to a min-per-group aggregate joined back — "
        "exactly two supplier scans, zero nested loops; "
        "nation/region broadcast as bounded dims."),
    "excess_share_suppliers": (
        "TPC-H Q20 shape (r7): part-name filter semi-joined into ONE "
        "lineitem scan (shipdate pushed down); the per-part "
        "denominator is a partitioned window over the aggregated "
        "(partkey, suppkey) frame, so the fact is never rescanned; "
        "qualifying-supplier key set semi-joins suppliers."),
    "bm25_top_docs_served": (
        "Persisted-index serving plan (r9): bucket-pruned postings "
        "FileScan (SelectedBucketsCount — non-matching buckets never "
        "listed), tok-keyed df groupBy satisfied by the bucketed "
        "scan's hash distribution (ZERO Exchange on the tok side, "
        "guarded in tests/test_lexical_index.py), df + additive "
        "(N, avgdl) stats broadcast back, ONE shuffle total (the "
        "matched-postings score groupBy), TakeOrderedAndProject cap."),
    "phrase_match_served": (
        "Positional-index serving plan (r9): each phrase term reads "
        "its own bucket-pruned slice of the positions table "
        "(SelectedBucketsCount: 1 out of 8 per side), the adjacency "
        "self-join is doc_id-equi-keyed over the two terms' "
        "query-bounded position sets, and the per-doc occurrence "
        "groupBy is the only corpus-derived shuffle — bounded by "
        "phrase hits."),
    "proximity_ranked_served": (
        "Same bucket-pruned two-term read as phrase_match_served; "
        "the |pos_a − pos_b| ≤ w band predicate rides the doc_id "
        "equi-join as a post-join filter — the join never widens "
        "beyond matched documents' term positions."),
    "doc_fetch_served": (
        "The complete rank→fetch serving loop (r9): BM25 probe plan "
        "as in bm25_top_docs_served, then the k ranked ids land as a "
        "literal IN predicate on the docstore's doc_id bucket column "
        "— a bucket-pruned point lookup (file-level bucket-set "
        "pruning + sortBy(doc_id) row-group min/max, pinned in "
        "tests/test_docstore.py), broadcast score join-back, zero "
        "corpus-sized shuffles at serve time."),
    "late_interaction_rerank": (
        "ColBERT-style MaxSim second stage (r9): the only corpus-"
        "sized work is the shared BM25 tf groupBy; the 50-doc "
        "shortlist cut bounds everything after it — doc tokens via a "
        "left-semi join on shortlist ids, query embeddings a 3-row "
        "broadcast literal frame, MaxSim a BroadcastNestedLoopJoin of "
        "shortlist-tokens x query-terms, both rescoring groupBys "
        "keyed on shortlist doc_ids. 3-point probe: 0.88x on 10x "
        "data, 1.09x on 3x (fixed-cost-dominated)."),
    "late_interaction_served": (
        "The served MaxSim twin (r9): shortlist from the lexical-index "
        "probe (bucket-pruned postings scan), shortlist tokens from "
        "the docstore used as a FORWARD index (doc_id-bucketed point "
        "fetch), shared _maxsim_rescore — zero corpus passes at serve "
        "time; reads |terms| postings buckets + |shortlist| docstore "
        "buckets. 3-point probe: 1.14x on 10x data, 1.01x on 3x."),
    "bm25_tombstone_served": (
        "Lazy deletion under the serving plan (r10): identical "
        "bucket-pruned probe as bm25_top_docs_served plus ONE "
        "broadcast left-anti join against the tombstone sidecar "
        "(delete-request-bounded, never corpus-sized) applied before "
        "the top-k cut; df/N/avgdl keep counting deleted docs until "
        "vacuum — Lucene's delete-then-merge scoring, stated exactly "
        "by the oracle."),
    "docstore_upsert_fetch": (
        "MERGE INTO on plain parquet (r10): the upsert rewrites ONLY "
        "the batch's hash buckets (pmod(murmur3, n) — the same "
        "expression the bucketizer uses, so the rewrite set can never "
        "miss a file); untouched bucket files stay byte-identical "
        "(pinned in tests/test_docstore.py). The serve half is the "
        "standard bucket-pruned literal-IN point fetch."),
    "bm25_batch_served": (
        "Batched BM25 serving (r10): ONE bucket-pruned postings scan "
        "covers the batch's distinct terms (each bucket opened once, "
        "however many queries share it), df per term computed once "
        "with zero Exchange and shared across queries, scores grouped "
        "by (query_id, doc_id), per-query top-k via a query_id-"
        "PARTITIONED rank window — hash-distributed, never a global "
        "sort. Single-query parity with bm25_probe pinned in "
        "tests/test_lexical_index.py."),
    "cobucketed_order_revenue": (
        "Co-located fact⋈fact join (r10): orders and lineitem "
        "bucketed+sorted on the order key at the same count, so the "
        "SortMergeJoin needs ZERO exchanges (and zero sorts with one "
        "file per bucket under the legacy outputOrdering conf — both "
        "pinned in tests/test_plans.py); the only shuffle in the "
        "query is the 5-group priority aggregate. At 100 TB the "
        "schema's biggest join becomes a bucket-pair zip, paid once "
        "at write time."),
    "linkgraph_khop_sssp": (
        "Weighted hop-bounded Bellman-Ford (r10): each of the 4 "
        "relaxation rounds is one dist⋈edges equi-join plus one MIN "
        "groupBy on the destination — linear in |edges| per round, "
        "shuffles keyed on node ids only; the weighted edge frame is "
        "persisted once and reused by every round. Candidate edges "
        "come from the rare-gram equi-join (frequency-capped fuse), "
        "never all-pairs."),
    "doc_pareto_frontier": (
        "Two-phase distributed skyline (r10): phase 1 reduces each "
        "Arrow batch to its local frontier via mapInPandas — NARROW, "
        "zero shuffle, sound because batch-dominated implies "
        "globally-dominated; the only movement is the candidate "
        "union into the single global pass (frontier-sized — "
        "O(log^{d-1} n) expected for random data, 53 rows at "
        "sf0.01). The scan reads only (doc_id, text) and the "
        "dims compute in codegen before the pandas kernel."),
    "semantic_decontamination_ann": (
        "ANN-gated semantic decontamination (r11): the bench side is "
        "IVF-indexed (k-means trained on the bench subset, driver-"
        "held centroids become a codegen'd argmax — no crossJoin), "
        "each corpus vector explodes into its nprobe=2 nearest "
        "clusters (narrow pass) and equi-joins the BROADCAST "
        "assigned bench on cluster — per-vector work is probed-"
        "cluster mass, not |bench|; one per-vector top-1 window."),
    "linkgraph_pagerank": (
        "PageRank with the r11 combiner restructure: per-node share "
        "computed in a node-sized join with the persisted degree "
        "table, so each iteration's edge join carries one narrow "
        "(u, share) row per node instead of (pr, outdeg) per edge; "
        "the edge derivation persists once for all iterations, and "
        "the groupBy(v) sum is map-side combined."),
    "lineitem_zorder_pruned": (
        "Z-ordered layout + file-stats pruning (r10; manifest-table "
        "redesign r11): the layout build (Morton key in pure Catalyst "
        "bit arithmetic, range-partition + sort) is the corpus-sized "
        "write a deployment pays once; the serve-side scan's FILE "
        "LIST is pruned by a DataFrame filter over the per-file "
        "min/max parquet manifest (distributed — the driver collects "
        "only survivors) before Spark opens anything, so bytes read "
        "scale with the "
        "predicate's selectivity on BOTH range columns (pruning "
        "evidence in tests/test_zorder.py); the exact predicate "
        "re-applies to survivors, making results pruning-independent."),
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from jcf_nb_migration_spark import get_spark
    from jcf_nb_migration_spark.registry import all_queries

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")

    out = ["# PLANS — physical-plan audit of headline queries",
           "",
           f"Generated by tools/plan_audit.py at {sf_dir}. These are the",
           "plan shapes the tests in tests/test_plans.py pin down.",
           ""]
    for name in COMMENTARY:
        q = all_queries()[name]
        plan = q.fn(spark, sf_dir)._jdf.queryExecution().explainString(mode)
        out += [f"## {name}", "", COMMENTARY[name], "",
                "```", plan.strip(), "```", ""]
    with open("PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote PLANS.md ({len(out)} lines)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
