"""Physical-plan assertions: guard the performance-critical plan shapes
(pushdown, pruning, broadcast, no cartesian products) so a future edit
can't silently regress them. These are the properties `.explain`
auditing established; see SURVEY.md §4."""

import pytest

from jcf_nb_migration_spark.registry import all_queries
from tests.conftest import SF_SMALL


def plan_of(spark, name: str) -> str:
    df = all_queries()[name].fn(spark, SF_SMALL)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = plan_of(spark, "pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan     # predicate reached scan
    assert "l_orderkey" not in plan                 # unused column pruned
    # partial-agg + sort exchanges only (formatted plans list each node
    # in both tree and detail sections)
    assert plan.count("Exchange") <= 4


def test_forecast_revenue_all_filters_pushed(spark):
    plan = plan_of(spark, "forecast_revenue")
    for frag in ("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
                 "GreaterThanOrEqual(l_discount", "LessThan(l_quantity"):
        assert frag in plan, frag


def test_dimension_joins_broadcast(spark):
    for q in ("regional_customer_distribution", "top_revenue_customers",
              "local_supplier_volume"):
        plan = plan_of(spark, q)
        assert "BroadcastHashJoin" in plan, q
        assert "CartesianProduct" not in plan, q
        assert "SortMergeJoin" not in plan, q       # dims must not shuffle


def test_blocked_pair_joins_are_not_cartesian(spark):
    for q in ("embedding_dedup_pairs", "part_name_fuzzy_pairs",
              "dedup_ngram_jaccard", "simhash_near_pairs",
              "fuzzy_name_matches",
              # r6 pair producers: banded Hamming, two-table deletion
              # blocking
              "media_perceptual_dedup", "record_linkage_merge"):
        plan = plan_of(spark, q)
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q
    # association_rules_pairs: the PAIR join must be the basket-key
    # equi-join (no cartesian), but its n_tx scalar legitimately
    # arrives via a 1-row broadcast crossJoin (BNLJ) — the
    # important_supplier_share idiom
    plan = plan_of(spark, "association_rules_pairs")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan


def test_interval_overlap_join_is_broadcast_not_cartesian(spark):
    """promo_session_attribution has NO equi-key by design — the
    broadcast nested-loop against the tiny time-grid calendar is the
    intended plan; an unbroadcast CartesianProduct would mean the
    calendar side lost its size bound."""
    plan = plan_of(spark, "promo_session_attribution")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_purge_is_predicate_not_join(spark):
    plan = plan_of(spark, "document_purge")
    assert "Join" not in plan
    assert "Filter" in plan


def test_migration_pipeline_is_narrow(spark):
    """The E2E migration chain must stay shuffle-free (embarrassingly
    parallel): no Exchange anywhere in the output plan."""
    from tests.test_migration_pipeline import CRM_ROWS, CRM_SCHEMA, RULES
    from jcf_nb_migration_spark.pipeline import MigrationConfig, run_migration

    crm = spark.createDataFrame(CRM_ROWS, CRM_SCHEMA)
    religions = spark.createDataFrame(
        [("christian", "Christianity")],
        "`Values in Data` string, `Replacement Values` string")
    cfg = MigrationConfig(
        purge_exemptions={"Constituency": "Southampton, Test"},
        date_cols=("Join Date",),
        value_lookups={"Faith": (religions, "Values in Data",
                                 "Replacement Values")})
    res = run_migration(crm, RULES, cfg)
    plan = res.output._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    # The fact path must not shuffle: the only shuffle exchanges allowed
    # are on the (tiny) lookup-table dedup feeding a broadcast. One
    # value lookup is configured → at most one such exchange.
    shuffles = plan.replace("BroadcastExchange", "BX").count("+- Exchange")
    assert shuffles <= 1, plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the lookup remap


def test_curation_joins_are_equi(spark):
    """Curation-suite candidate generation must stay equi-join-shaped:
    decontamination joins on the n-gram string, SemDeDup pairs on the
    cluster id, repetition stats on (doc_id, gram) — no pairwise
    nested-loop anywhere."""
    for q in ("decontaminate_ngrams", "semdedup_prune",
              "doc_repetition_stats"):
        plan = plan_of(spark, q)
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q


def test_mixture_sample_only_one_row_nested_loop(spark):
    """corpus_mixture_sample crosses every doc with the ONE-row corpus
    totals aggregate (broadcast, no row amplification) — that is the
    only nested-loop allowed; the per-source rate join must be equi."""
    plan = plan_of(spark, "corpus_mixture_sample")
    assert "CartesianProduct" not in plan
    # one physical node = two mentions (tree + detail section)
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_pii_scrub_is_narrow(spark):
    """PII scrubbing is a pure projection: no joins, no aggregation
    shuffle — the only allowed exchange is the small-input spread()
    repartition (a no-op on real multi-split inputs)."""
    plan = plan_of(spark, "pii_scrub_stats")
    assert "Join" not in plan
    assert plan.count("+- Exchange") <= 1


def test_tpch_shape_plans(spark):
    """New TPC-H shapes: dims broadcast, no cartesian products, and
    Q17's decorrelated per-part average joins on the agg key."""
    for q in ("promo_revenue_share", "nation_trade_volume",
              "large_volume_customers", "small_quantity_revenue"):
        plan = plan_of(spark, q)
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q
    plan = plan_of(spark, "nation_trade_volume")
    assert "BroadcastHashJoin" in plan
    # shipdate range pushed to the lineitem scan
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_curation_funnel_single_scan(spark):
    """The 4-stage funnel is one scan + one aggregate, not one job per
    stage."""
    plan = plan_of(spark, "curation_funnel")
    assert plan.count("Scan parquet") <= 2  # tree + detail sections


def test_aqe_splits_skewed_join(spark):
    """The session's AQE skew-join confs actually fire: a 90%-one-key
    join is re-planned at runtime with SortMergeJoin(skew=true) and a
    'coalesced and skewed' AQEShuffleRead — the no-code-change answer
    to hot keys that salting (functions/skew.py) handles manually.
    Thresholds are lowered to make a test-sized input register as
    skewed; at real scale the defaults (256 MB partitions) play the
    same role."""
    from pyspark.sql import functions as F

    lowered = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in lowered}
    try:
        for k, v in lowered.items():
            spark.conf.set(k, v)
        fact = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id"))
             .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("p"))
        dim = spark.range(0, 20_000).select(
            F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id"))
            .alias("d"))
        j = fact.join(dim, "k")
        assert len(j.collect()) == 182_000  # executes THIS plan instance
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_source_embedding_drift_single_corpus_pass(spark):
    """The drift monitor must read each input ONCE: the global
    centroid is derived from the per-source sums by a window, not by
    re-aggregating the corpus in a second branch (the original
    three-branch formulation showed 3 scan+explode subtrees)."""
    plan = plan_of(spark, "source_embedding_drift")
    # formatted plans list each scan in tree + detail sections, so an
    # N-scan plan shows exactly 2N occurrences (exact match: floor
    # division would let an odd count slip through)
    assert plan.count("Scan parquet") == 4        # embeddings + documents
    assert plan.count("Generate") == 2            # one posexplode
    assert "CartesianProduct" not in plan


def test_no_unmarked_unpartitioned_windows():
    """Every unpartitioned ``Window.orderBy`` in the package funnels
    its whole input through ONE task — a scale killer unless the input
    is provably bounded. Each such site must carry a
    ``# bounded-window:`` comment within the 3 preceding lines, and
    (r6 hardening — a free-text "population-bounded" marker slipped a
    GROWING bound through in r5's signup_to_purchase_latency) the
    marker must name its bound CLASS from a closed taxonomy:

    - ``const:<N>``      — literally ≤N rows, N a numeric constant
    - ``buckets:<conf>`` — one row per range/shuffle bucket, bounded
                           by the named config, constant in data size
    - ``post-limit:<N>`` — applied after ``.limit(N)``
    - ``grid:<unit>``    — calendar/granularity grid: cardinality is
                           the time span, independent of row count

    Anything else (population-sized, dimension-sized, corpus/K) fails:
    the fix is two-phase range-partitioned ranking (corpus_vocabulary
    / sequence_packing / signup_to_purchase_latency), not a marker."""
    import pathlib
    import re

    taxonomy = re.compile(
        r"# bounded-window: "
        r"(const:\d+|buckets:[\w.]+|post-limit:\d+|grid:\w+)")
    qdir = (pathlib.Path(__file__).resolve().parent.parent
            / "jcf_nb_migration_spark")
    bad = []
    for py in sorted(qdir.rglob("*.py")):
        lines = py.read_text().splitlines()
        for i, line in enumerate(lines):
            if "Window.orderBy(" not in line or line.lstrip().startswith("#"):
                continue
            ctx = "\n".join(lines[max(0, i - 3):i + 1])
            if "# bounded-window:" not in ctx:
                bad.append(f"{py.name}:{i + 1} (unmarked)")
            elif not taxonomy.search(ctx):
                bad.append(f"{py.name}:{i + 1} (marker lacks a bound "
                           "class: const:<N>|buckets:<conf>|"
                           "post-limit:<N>|grid:<unit>)")
    assert not bad, (
        "unpartitioned Window.orderBy without a typed "
        f"'# bounded-window:' justification: {bad}")


def test_corpus_sorted_export_is_range_partitioned(spark):
    """The corpus-wide ORDER BY must plan as a RANGE-partitioned
    exchange + per-partition sort (every task sorts a disjoint key
    slice), never a single-partition funnel. Also pins column pruning:
    the export reads only its three columns, not text."""
    plan = plan_of(spark, "corpus_sorted_export")
    assert "rangepartitioning" in plan.lower(), plan
    assert "SinglePartition" not in plan, plan
    assert "Sort" in plan
    assert "text" not in plan          # pruned at the scan


def test_top_supplier_revenue_single_lineitem_scan(spark):
    """Q15's scalar-max restructure (r6): the per-supplier rev frame
    is persisted and both the max branch and the equality-join branch
    read the cache, so lineitem appears in the plan exactly once —
    a regression to two structural scans (or back to the global-max
    window) changes these counts."""
    plan = plan_of(spark, "top_supplier_revenue")
    assert plan.count("lineitem.parquet") == 1, plan.count("lineitem.parquet")
    assert "InMemoryTableScan" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_two_phase_rank_queries_range_partition(spark):
    """The two-phase rank family (r6): each must carry an Exchange
    rangepartitioning (the sampled-balanced bucket assignment) — a
    regression to a single global ordered window would drop it. The
    bounded-window grep guard covers the subtotal windows' bounds;
    this pins the physical bucket shuffle itself."""
    for q in ("signup_to_purchase_latency", "winsorized_order_values",
              "customer_balance_deciles"):
        plan = plan_of(spark, q)
        assert "rangepartitioning" in plan.lower(), q
        assert "CartesianProduct" not in plan, q


def test_no_global_lit1_windows():
    """``Window.partitionBy(lit(1))`` is the other global-funnel
    spelling — an unordered window that still routes every row through
    one task. r5 had two sites (signup_to_purchase_latency's COUNT,
    top_supplier_revenue's MAX); both were replaced by broadcast
    1-row scalar aggregates (the important_supplier_share idiom).
    This guard keeps the spelling extinct."""
    import pathlib
    import re

    pat = re.compile(r"partitionBy\(\s*(F\.)?lit\(1\)")
    qdir = (pathlib.Path(__file__).resolve().parent.parent
            / "jcf_nb_migration_spark")
    hits = []
    for py in sorted(qdir.rglob("*.py")):
        for i, line in enumerate(py.read_text().splitlines()):
            if pat.search(line) and not line.lstrip().startswith("#"):
                hits.append(f"{py.name}:{i + 1}")
    assert not hits, (
        "global Window.partitionBy(lit(1)) found — use a broadcast "
        f"scalar aggregate instead: {hits}")


def test_source_sampling_weights_single_corpus_pass(spark):
    """The totals (z, tok_total) must come from the global window over
    the bounded per-source frame, not a second aggregate branch over
    documents — one lineage means the single scan is structural, not
    an exchange-reuse accident (the AQE-dependence ADVICE r4 flagged
    in the crossJoin formulation)."""
    plan = plan_of(spark, "source_sampling_weights")
    assert plan.count("Scan parquet") == 2   # documents, once
    assert "CartesianProduct" not in plan


def test_wide_migration_plan_stays_fused_at_reference_width(spark):
    """Codegen-audit guard at the reference's 297-column shape
    (NOTES.md 'Wide-projection codegen audit'): the 40 two-source
    merges and ~240-column output must stay folded into a HANDFUL of
    Project nodes over one pass — a refactor back to per-merge
    projections would show ~40 Projects and a deep analysis tree.
    Also pins filter placement (the purge/scope Filter runs on the
    narrow source, below the wide projection) and a generous wall
    ceiling that catches catastrophic regressions (projection
    explosion, Janino retry storms) without flaking on load."""
    import importlib.util
    import pathlib
    import re
    import time

    from jcf_nb_migration_spark.pipeline import MigrationConfig, run_migration

    tool = (pathlib.Path(__file__).resolve().parent.parent
            / "tools" / "scale_migration_bench.py")
    spec = importlib.util.spec_from_file_location("smb", tool)
    smb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(smb)

    df = smb.build_frame(spark, 3000, 297)
    rules = smb.build_rules(297)
    religions = spark.createDataFrame(
        [("christian", "Christianity"), ("muslim", "Islam")],
        "`Values in Data` string, `Replacement Values` string")
    cfg = MigrationConfig(
        key_col="Email", date_cols=("Join Date",),
        value_lookups={"Faith": (religions, "Values in Data",
                                 "Replacement Values")})
    t0 = time.time()
    res = run_migration(df, rules, cfg)
    plan = res.output._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    res.output.write.format("noop").mode("overwrite").save()
    elapsed = time.time() - t0

    tree = plan.split("\n\n")[0]
    # merge fold intact: a few Projects (fact chain + join output),
    # not one per merge pair (tree section only — details repeat them)
    assert tree.count("Project") <= 6, tree
    # purge/scope filter evaluates on the narrow source, directly above
    # the leaf — not hoisted above the 240-column projection
    assert re.search(r"Filter \(\d+\)\s*\n[^\n]*\+- (Range|Scan)", tree), tree
    # pipeline adds at most one shuffle (the tiny lookup-dedup feeding
    # a broadcast); the other Exchange belongs to the synthetic
    # generator's repartition, not the pipeline
    assert tree.count("Exchange") - tree.count("BroadcastExchange") <= 2, tree
    assert "SortMergeJoin" not in tree
    # catastrophic-regression ceiling: steady-state measures ~10 s cold
    # on this box at 5k rows; 90 s trips only on real pathology
    assert elapsed < 90, elapsed


def test_linkgraph_pagerank_no_cartesian_and_bounded_joins(spark):
    """PageRank's edge derivation must stay a frequency-capped
    equi-join (never all-pairs) and every power iteration an equi-join
    + hash aggregate on doc_id keys."""
    plan = plan_of(spark, "linkgraph_pagerank")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the persisted edge table is reused by all 5 iterations
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
    # final cut is TakeOrdered, not a global-window rank
    assert "TakeOrderedAndProject" in plan


def test_cms_token_counts_broadcasts_the_sketch(spark):
    """The 4x256 sketch is bounded by construction — the probe join
    must broadcast it, and no plan node may be all-pairs."""
    plan = plan_of(spark, "cms_token_counts")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # exact top-k cut


def test_lateral_topn_decorrelates_to_window_group_limit(spark):
    """The LATERAL ordered-limit subquery must decorrelate into a
    per-key ranked take (WindowGroupLimit pushes the top-2 cut below
    the shuffle) — never a per-outer-row re-execution or a nested
    loop."""
    plan = plan_of(spark, "lateral_top_customers")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_nullsafe_join_stays_equi_join(spark):
    """eqNullSafe must compile to a hash-partitionable key
    (coalesce+isnull expansion) — a regression to
    BroadcastNestedLoopJoin would be quadratic at scale."""
    plan = plan_of(spark, "nullsafe_cohort_compare")
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "FullOuter" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_new_dedup_shapes_not_cartesian(spark):
    """Containment candidates come from the rare-shingle equi-join;
    paragraph dedup is explode → hash window → agg; trigram scoring
    is a vocabulary-keyed left-join chain. None may plan a cartesian
    or nested-loop join (the only allowed BroadcastNestedLoopJoin is
    a 1-row scalar crossJoin, which these queries don't use)."""
    for q in ("doc_containment_pairs", "paragraph_dedup"):
        plan = plan_of(spark, q)
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q
    # trigram's only nested-loop is the broadcast 1-row token total
    # (formatted plans list each node twice: tree + detail section)
    plan = plan_of(spark, "trigram_backoff_score")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_quantized_rerank_broadcasts_probe_and_stats(spark):
    """The coarse pass must broadcast the per-dim stats (bounded by
    dimensionality) and the 1-row probe; the corpus side must never
    shuffle into a cartesian."""
    plan = plan_of(spark, "quantized_rerank_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan          # stats join on dim_idx
    # the broadcast 1-row probe is the only nested-loop (×2: formatted
    # plans list each node in both the tree and the detail section)
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_profit_star_join_broadcasts_dims_no_cartesian(spark):
    """Q9 shape: the regex-filtered part dim and nation must join
    without a cartesian; at least one dimension broadcast-joins."""
    plan = plan_of(spark, "profit_by_nation_year")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "PushedFilters" in plan


def test_q2_q20_shapes_decorrelate(spark):
    """r7 TPC-H Q2/Q20 shapes: the correlated subquery must be a
    min-per-group join-back (inner aggregated ONCE), the nested
    IN-chain a semi-join pipeline over ONE fact scan — never a
    per-outer-row rescan (no nested-loop / cartesian)."""
    plan = plan_of(spark, "regional_min_balance_supplier")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # decorrelated: base supplier scan + inner-agg supplier scan, no N-way
    assert sum("supplier" in ln for ln in plan.splitlines()
               if "Location:" in ln) == 2, plan
    assert "BroadcastHashJoin" in plan      # bounded dims broadcast

    plan = plan_of(spark, "excess_share_suppliers")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the per-part denominator is a window over the aggregated frame,
    # never a second fact scan: exactly ONE lineitem scan in the plan
    # (formatted detail lists one Location line per physical scan)
    assert sum("lineitem" in ln for ln in plan.splitlines()
               if "Location:" in ln) == 1, plan
    # shipdate range pushed into that scan
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_retrieval_pipeline_e2e_shortlists_are_equi(spark):
    """r7 hybrid retrieval e2e: the ANN shortlist must be the
    multiprobe bucket EQUI-join (7 buckets, never a corpus scan) and
    the only nested-loop the 1-row BM25 stats crossJoin (same
    allowance as corpus_mixture_sample)."""
    plan = plan_of(spark, "retrieval_pipeline_e2e")
    assert "CartesianProduct" not in plan
    # one physical node = two mentions (tree + detail section)
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    locs = [ln for ln in plan.splitlines() if "Location:" in ln]
    # documents: gate + dl/occ branches + metadata join-back (each
    # column-pruned); embeddings: bucketed corpus + probe row
    assert sum("documents" in ln for ln in locs) <= 6, plan
    assert sum("embeddings" in ln for ln in locs) <= 2, plan


def test_cobucketed_join_elides_exchanges_and_sorts(spark):
    """The co-located-join claim (r10, io/layout.write_bucketed
    docstring): with orders and lineitem bucketed+sorted on the order
    key at the same bucket count, a SortMergeJoin on that key needs
    NEITHER exchange NOR sort — the scans already provide the hash
    distribution and per-bucket order. Forced to SMJ via the merge
    hint (at fixture scale the planner would broadcast; at 100 TB SMJ
    is what AQE picks, and bucketing is what makes it shuffle-free)."""
    from pyspark.sql import functions as F

    # build the scratch layouts exactly as the query does
    all_queries()["cobucketed_order_revenue"].fn(spark, SF_SMALL)
    import hashlib

    tag = hashlib.md5(SF_SMALL.encode()).hexdigest()[:8]
    o = spark.table(f"cobkt_ord_{tag}")
    li = spark.table(f"cobkt_li_{tag}")
    joined = (o.hint("merge")
              .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
              .select("o_orderkey", "l_extendedprice"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Bucketed: true" in plan, plan
    # Sort elision additionally needs the scan to REPORT per-bucket
    # order — off by default since Spark 3.0 because it is only sound
    # with one file per bucket (which the coalesce(1) write guarantees
    # here); under the documented conf the sorts disappear too.
    conf = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    prev = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "true")
        joined2 = (o.hint("merge")
                   .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
                   .select("o_orderkey", "l_extendedprice"))
        plan2 = joined2._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan2, plan2
        assert "Sort " not in plan2.replace("SortMergeJoin", "SMJ"), plan2
    finally:
        spark.conf.set(conf, prev)
    # the full query adds exactly one exchange: the priority groupBy
    # (partial+final around it); the join itself contributes none
    full = all_queries()["cobucketed_order_revenue"].fn(spark, SF_SMALL)
    fplan = full._jdf.queryExecution().executedPlan().toString()
    assert fplan.count("Exchange hashpartitioning") <= 2, fplan
    assert "CartesianProduct" not in fplan


def test_scratch_index_paths_are_application_keyed():
    """Concurrency guard (r10, promoted from a verify-skill gotcha to
    CI): every registry query that builds a scratch index under the
    system temp dir MUST key the path by the Spark applicationId —
    the full suite and the verify_local sweeps run concurrently on
    this host and would rmtree each other's live index otherwise. A
    new *_served query that forgets the key fails here, not as a
    flaky sweep."""
    import re
    from pathlib import Path

    qdir = (Path(__file__).resolve().parent.parent
            / "jcf_nb_migration_spark" / "queries")
    offenders = []
    for f in sorted(qdir.glob("*.py")):
        src = f.read_text()
        for m in re.finditer(r"def (\w+)\([^)]*\).*?(?=\ndef |\Z)",
                             src, re.S):
            body = m.group(0)
            if "tempfile.gettempdir()" in body \
                    and "applicationId" not in body:
                offenders.append(f"{f.name}:{m.group(1)}")
    assert not offenders, (
        "scratch index paths not keyed by applicationId: "
        f"{offenders}")


def test_khop_sssp_no_cartesian_and_persisted_edges(spark):
    """Every Bellman-Ford round must be an equi-join + MIN hash
    aggregate on node ids (never all-pairs), with the weighted edge
    frame persisted once and reused by all rounds."""
    plan = plan_of(spark, "linkgraph_khop_sssp")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
    # the final cut is a bounded top-k, not a global-window rank
    assert "TakeOrderedAndProject" in plan


def test_pareto_frontier_local_pass_is_narrow(spark):
    """Phase 1 of the skyline (the per-batch local frontier) must run
    with NO exchange upstream: the only SinglePartition exchange in
    the plan is the candidate union feeding the global pass."""
    plan = plan_of(spark, "doc_pareto_frontier")
    assert "CartesianProduct" not in plan
    assert plan.count("SinglePartition") == 1  # formatted plans name
    #   the exchange's distribution in its Arguments detail line
    # dims computed in codegen BEFORE the pandas kernel: the scan reads
    # only the two source columns
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) \
        == {"doc_id", "text"}
    # exactly two pandas stages: local kernel + global kernel
    # (formatted plans list each node in tree + detail sections)
    assert plan.count("MapInPandas") == 4


def test_zorder_scan_reads_only_surviving_files(spark, tmp_path):
    """The executed scan's FilePartitions must contain EXACTLY the
    manifest-surviving files — pruning happens before Spark lists
    anything, not as a best-effort filter."""
    import random

    from jcf_nb_migration_spark.io.zorder import (write_zordered,
                                                  zordered_file_count,
                                                  zordered_scan)
    from jcf_nb_migration_spark.testing import files_touched

    rng = random.Random(13)
    df = spark.createDataFrame(
        [(i, rng.randint(0, 9999), rng.randint(0, 9999))
         for i in range(20000)], "id bigint, a bigint, b bigint")
    path = str(tmp_path / "z")
    write_zordered(df, path, ["a", "b"], n_files=32)
    ranges = {"a": (0, 1500), "b": (0, 1500)}
    surv, total = zordered_file_count(spark, path, ranges)
    assert 0 < surv < total
    touched = files_touched(zordered_scan(spark, path, ranges))
    assert touched["files"] == surv


def test_ann_decontamination_is_equi_join_not_fold(spark):
    """semantic_decontamination_ann (r11): the ANN-gated screen must
    score via the cluster EQUI-join against the broadcast assigned
    bench — never a per-bench-vector fold (the exact variant's
    legitimate broadcast nested loop) and never a cartesian."""
    plan = plan_of(spark, "semantic_decontamination_ann")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
