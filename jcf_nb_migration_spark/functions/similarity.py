"""Embedding similarity: cosine expressions, brute-force ANN baseline,
and deterministic random-hyperplane LSH for the scale path.

The dot product / norm are fold expressions over ArrayType(Float) —
JVM-side, no Python. Both Spark's ``aggregate`` and DuckDB's
``list_dot_product`` fold left-to-right over doubles, so results are
bit-identical (verified empirically), making these oracle-checkable.

Scale notes: brute-force top-k against one probe is a single scan with
a k-row sort — fine at any scale for one probe, O(N·Q) for Q probes.
The LSH variant buckets vectors by sign patterns against fixed
hyperplanes so a probe only scans its bucket (recall traded for a
~2^planes fan-in reduction); at 100 TB you'd also write the table
bucketed on ``bucket`` so probes prune partitions.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i, folded left-to-right over doubles."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_precast(a: Column | str, b: Column | str) -> Column:
    """``dot`` over operands ALREADY cast to double arrays: skips the
    per-evaluation ``transform(cast)`` that ``dot`` applies to each
    side. Pre-cast each side ONCE (``as_double``) before a pairwise
    join so the per-pair fold does only the multiply-adds — the
    higher-order-function fold is CodegenFallback (interpreted), so
    every expression node removed from it is paid n×m times in a
    screen. Bit-identical to ``dot`` on the same values (casting a
    double array to double is an element-wise identity)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(vec: Column) -> Column:
    return F.sqrt(dot(vec, vec))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(emb: DataFrame, probe: DataFrame, k: int = 10,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors of a single probe vector (broadcast
    the probe; one scan of the corpus; k-row ordered take).
    A zero-norm (or NULL) probe yields an empty result — the same
    guard semantics as brute_force_topk_pandas, kept as a lazy filter
    on the broadcast side so no extra job runs.
    Columns: neighbor_id, cos_sim."""
    from jcf_nb_migration_spark.registry import spread

    p = F.broadcast(probe.where(norm(F.col(vec_col)) > 0)
                    .select(F.col(vec_col).alias("__probe_vec")))
    return (
        spread(emb).crossJoin(p)
        .select(
            F.col(id_col).alias("neighbor_id"),
            cosine(F.col(vec_col), F.col("__probe_vec")).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "neighbor_id")
        .limit(k)
    )


def brute_force_topk_pandas(emb: DataFrame, probe: DataFrame, k: int = 10,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Vectorized-Pandas-UDF variant of brute_force_topk: cosines
    computed per Arrow batch with one numpy matrix-vector product
    instead of a per-row fold expression.

    When to use which: the JVM fold is allocation-free and
    whole-stage-codegen'd — it wins on narrow vectors (≤~100 dims).
    A 1536-dim embedding column flips the economics: one BLAS
    matvec per ~10k-row Arrow batch beats 1536 codegen'd
    multiply-adds per row. Same single-scan plan either way; only the
    per-batch kernel differs. Results are numerically equal to ~1e-7
    (numpy pairwise-sums; the fold is strictly sequential), so this
    variant is ranking-tested against the exact fold, not
    hash-compared. Columns: neighbor_id, cos_sim."""
    import numpy as np
    import pandas as pd

    from jcf_nb_migration_spark.localrel import local_df
    from jcf_nb_migration_spark.registry import spread

    out_schema = "neighbor_id long, cos_sim double"
    head = probe.select(vec_col).head(1)
    if not head or head[0][0] is None:
        # empty/NULL probe: empty result with the declared schema
        return local_df(emb.sparkSession, [], out_schema)
    pvec = np.asarray(head[0][0], dtype=np.float64)
    pnorm = float(np.sqrt(pvec @ pvec))
    if pnorm == 0.0:  # zero-norm probe: every cosine is undefined
        return local_df(emb.sparkSession, [], out_schema)
    sess = emb.sparkSession
    bpvec = sess.sparkContext.broadcast(pvec)

    def score(batches):
        for pdf in batches:
            m = np.array([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            # Zero-norm corpus rows produce NaN (0/0) — the same value
            # the JVM fold path yields, and Spark's descending sort
            # ranks NaN first in both variants, so semantics match
            # brute_force_topk instead of silently diverging.
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (m @ bpvec.value) / (
                    np.sqrt((m * m).sum(axis=1)) * pnorm)
            yield pd.DataFrame({"neighbor_id": pdf[id_col],
                                "cos_sim": sims})

    out = spread(emb.select(id_col, vec_col)).mapInPandas(
        score, schema="neighbor_id long, cos_sim double")
    return out.orderBy(F.desc("cos_sim"), "neighbor_id").limit(k)


def _centroid_rows(centroids, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> list[tuple[int, list[float]]]:
    """Driver-side centroid list [(id, vector), ...], sorted by id.
    Accepts a DataFrame (collected — K is small by definition: it's the
    coarse quantizer, control-plane metadata like a broadcast dim) or
    an already-collected list."""
    if isinstance(centroids, DataFrame):
        centroids = [(r[0], r[1])
                     for r in centroids.select(id_col, vec_col).collect()]
    return sorted((int(i), [float(x) for x in v]) for i, v in centroids)


def _sql_expr_of(vec: Column | str) -> str:
    """SQL text for a vector operand: a plain column name is quoted
    directly; any other Column renders through its unresolved
    expression's canonical SQL (one py4j call for the whole operand)."""
    if isinstance(vec, str):
        if re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", vec):
            return f"`{vec}`"
        vec = F.col(vec)
    return vec._jc.toString()


def _sql_dlit(x: float) -> str:
    """Exact double literal: repr() is the shortest round-trip decimal
    and Spark's literal parser (Double.parseDouble) is correctly
    rounded, so the parsed double is bit-identical to ``x``."""
    x = float(x)
    if x != x or x in (float("inf"), float("-inf")):
        raise ValueError(f"non-finite centroid component: {x}")
    return repr(x) + "D"


def _sql_vec_lit(v: list[float]) -> str:
    return "array(" + ", ".join(_sql_dlit(x) for x in v) + ")"


def _sql_as_double(e: str) -> str:
    # mirrors as_double: transform(vec, x -> cast double)
    return f"transform({e}, x -> CAST(x AS DOUBLE))"


def _sql_dot(a: str, b: str) -> str:
    # mirrors dot(): zip_with multiply, left-to-right aggregate fold
    # from a 0.0 double seed — the identical op sequence, so results
    # are bit-identical (parity pinned in tests/test_ann.py)
    return (f"aggregate(zip_with({_sql_as_double(a)}, "
            f"{_sql_as_double(b)}, (x, y) -> x * y), 0D, "
            f"(acc, v) -> acc + v)")


def _sql_cosine(a: str, b: str) -> str:
    return (f"({_sql_dot(a, b)} / (SQRT({_sql_dot(a, a)}) * "
            f"SQRT({_sql_dot(b, b)})))")


def _sql_sqdist(a: str, b: str) -> str:
    # mirrors sqdist(): the diff list appears twice, exactly like the
    # Column tree (dot(d, d) re-casts the already-double diff — a
    # semantic no-op kept for tree parity)
    d = (f"zip_with({_sql_as_double(a)}, {_sql_as_double(b)}, "
         f"(x, y) -> x - y)")
    return _sql_dot(d, d)


def _centroid_sims(vec_col: Column | str,
                   rows: list[tuple[int, list[float]]]) -> Column:
    """array(struct(sim, neg_id)) over the centroid list — the building
    block for narrow argmax/top-n centroid selection. Struct ordering
    is lexicographic, so max = (highest sim, then LOWEST centroid id
    via the negated id) — the same tie-break as ORDER BY sim DESC,
    c_id ASC.

    Built as ONE JVM-parsed SQL expression (the lsh_bucket fast-path
    precedent): the Column formulation spent seconds per call in py4j
    lambda construction — K centroids × cosine is ~12 K lambda nodes,
    each a py4j round trip — where the SQL string parses in
    milliseconds and yields the identical op sequence (bit parity
    pinned in tests/test_ann.py::test_centroid_sql_fastpath_parity).

    Beyond ``_CENTROID_UNROLL_MAX`` centroids the builder switches to
    ``_centroid_sims_folded`` (r14, VERDICT r13 item 9): the unrolled
    tree inlines each centroid literal THREE times (dot(v,c) plus the
    two norm folds) inside its own cosine subtree, so
    analysis/codegen grow ~3·K·dim and stall the driver at a few
    hundred centroids. The folded path carries the centroids as ONE
    nested-array literal and one transform lambda — constant operator
    count, data in a single literal node — and is bit-identical
    (tests/test_ann.py::test_centroid_folded_large_k_parity). Every
    registered query trains k=8, below the cutover, so no declared
    plan changes. For real-IVF centroid counts (K in the tens of
    thousands) ivf_assign_pandas ships the centroid matrix as a
    broadcast variable instead."""
    if len(rows) > _CENTROID_UNROLL_MAX:
        return _centroid_sims_folded(vec_col, rows)
    v = _sql_expr_of(vec_col)
    entries = []
    for cid, cvec in rows:
        c = _sql_vec_lit(cvec)
        entries.append(
            f"named_struct('sim', {_sql_cosine(v, c)}, "
            f"'neg_id', CAST({-cid} AS BIGINT))")
    return F.expr("array(" + ", ".join(entries) + ")")


# Above this K the unrolled per-centroid expression tree is replaced
# by the single-literal transform formulation. 64 keeps every
# registered query (all k=8 coarse quantizers) on the unrolled path —
# bit parity between the two is CI-pinned, but plans of declared
# queries stay byte-stable this round.
_CENTROID_UNROLL_MAX = 64


def _centroid_sims_folded(vec_col: Column | str,
                          rows: list[tuple[int, list[float]]]) -> Column:
    """Large-K formulation of _centroid_sims: one
    array(struct(id, vec)) literal + one transform lambda. The probe
    vector's norm fold and each centroid's norm fold render exactly
    like _sql_cosine's (same _sql_dot op sequence from the same 0D
    seed), so each struct's sim is the bit-identical double the
    unrolled path produces; neg_id negates the same BIGINT. Expression
    OPERATOR count is O(1) — the K·dim data rides in a single literal,
    which Catalyst parses/analyzes in one node instead of 3·K·dim
    literal nodes across K cosine subtrees."""
    v = _sql_expr_of(vec_col)
    cents = "array(" + ", ".join(
        f"named_struct('id', CAST({cid} AS BIGINT), "
        f"'vec', {_sql_vec_lit(cvec)})"
        for cid, cvec in rows) + ")"
    sim = (f"({_sql_dot(v, 'c.vec')} / (SQRT({_sql_dot(v, v)}) * "
           f"SQRT({_sql_dot('c.vec', 'c.vec')})))")
    return F.expr(
        f"transform({cents}, c -> named_struct("
        f"'sim', {sim}, 'neg_id', -c.id))")


def _centroid_sims_columns(vec_col: str,
                           rows: list[tuple[int, list[float]]]) -> Column:
    """The original Column-tree formulation of _centroid_sims, kept as
    the parity reference for the SQL fast path (never on a hot path)."""
    structs = []
    for cid, cvec in rows:
        lit = F.lit([float(x) for x in cvec])  # one literal node
        structs.append(F.struct(
            cosine(F.col(vec_col), lit).alias("sim"),
            F.lit(-cid).cast("bigint").alias("neg_id")))
    return F.array(*structs)


def ivf_assign(emb: DataFrame, centroids,
               id_col: str = "vec_id",
               vec_col: str = "embedding",
               extra_cols: tuple = ()) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid by cosine. Deterministic ties broken by lowest centroid
    id. Adds ``cluster``.

    The assignment is array_max over array(struct(sim, -id)) built
    from the driver-held centroid list — a single narrow codegen'd
    pass per row: no crossJoin row amplification (the old plan
    materialized N×K rows) and no window shuffle. At 100 TB the output
    is what you partition/bucket the corpus by; probes then read only
    their cluster's files."""
    rows = _centroid_rows(centroids, id_col, vec_col)
    best = F.array_max(_centroid_sims(vec_col, rows))
    return emb.select(
        F.col(id_col), F.col(vec_col),
        *[F.col(c) for c in extra_cols],
        (-best["neg_id"]).cast("bigint").alias("cluster"))


def ivf_probe_clusters(probes: DataFrame, centroids,
                       vec_col: str = "pvec",
                       nprobe: int = 2) -> DataFrame:
    """Per-probe cluster shortlist: explode each probe row into its
    ``nprobe`` nearest centroids (same narrow sort-descending pass as
    ivf_ann_probe, same ties — higher cosine then lower centroid id).
    Adds ``cluster``; one output row per (probe, probed cluster).

    This is the multi-probe generalization of ivf_ann_probe's
    single-probe shortlist: broadcast the result against the assigned
    corpus and the candidate set for a whole PROBE BATCH comes from
    one equi-join on cluster — the composition knn/hard-negative
    mining need to stop scanning the corpus per batch."""
    rows = _centroid_rows(centroids)
    top_n = F.slice(F.reverse(F.array_sort(_centroid_sims(vec_col, rows))),
                    1, nprobe)
    return (probes.withColumn("__c", F.explode(top_n))
            .withColumn("cluster", (-F.col("__c.neg_id")).cast("bigint"))
            .drop("__c"))


def ivf_assign_pandas(emb: DataFrame, centroids,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Large-K variant of ivf_assign: the K×dim centroid matrix ships
    as a Spark broadcast variable and each Arrow batch is assigned with
    one BLAS matrix-matrix product + argmax — no literal expression
    tree, so K is bounded by executor memory (a 65k×1536 float64 matrix
    is ~800 MB; float32 halves it), not by codegen limits.

    Cutover: prefer ivf_assign below ~a-few-hundred centroids (pure
    codegen, allocation-free); switch here above that. Ties and
    zero-norm rows resolve to the LOWEST centroid id in both variants
    (np.argmax takes the first maximum over the id-sorted matrix; NaN
    rows hit the first index), though float summation differs (~1e-7),
    so near-exact ties can diverge — ranking-tested, not hash-compared,
    same policy as brute_force_topk_pandas. Output schema matches
    ivf_assign: (id_col, vec_col, cluster)."""
    import numpy as np
    import pandas as pd

    from jcf_nb_migration_spark.registry import spread

    rows = _centroid_rows(centroids, id_col, vec_col)
    cids = np.array([cid for cid, _ in rows], dtype=np.int64)
    cmat = np.array([v for _, v in rows], dtype=np.float64)
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    sess = emb.sparkSession
    bc = sess.sparkContext.broadcast((cids, cmat, cnorm))

    def assign(batches):
        ids, mat, norms = bc.value
        for pdf in batches:
            m = np.array([np.asarray(v, dtype=np.float64)
                          for v in pdf[vec_col]])
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (m @ mat.T) / (
                    np.sqrt((m * m).sum(axis=1))[:, None] * norms[None, :])
            pdf = pdf[[id_col, vec_col]].copy()
            pdf["cluster"] = ids[np.argmax(sims, axis=1)]
            yield pdf

    schema = emb.select(id_col, vec_col).schema.add("cluster", "long")
    return spread(emb.select(id_col, vec_col)).mapInPandas(
        assign, schema=schema)


def kmeans_train(emb: DataFrame, k: int = 8, iters: int = 2,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd iterations over the corpus: seeds are the k
    lowest-id vectors (ORDER BY id LIMIT k — dense ids not assumed);
    each round assigns every vector with the narrow argmax and
    recomputes per-cluster/per-dimension means. Sums go
    through DECIMAL(18,12) so the means are order-independent —
    bit-reproducible across partitionings AND across engines (a DuckDB
    oracle replaying the same rounds gets the identical centroids).
    Empty clusters keep their previous centroid. The driver only ever
    holds the k×dim centroid matrix; each round is one scan + one
    (cluster, dim) aggregation."""
    rows = _centroid_rows(emb.orderBy(F.col(id_col).asc()).limit(k),
                          id_col, vec_col)
    return _lloyd_rounds(
        emb, rows, iters, vec_col,
        lambda r: -F.array_max(_centroid_sims(vec_col, r))["neg_id"])


def _lloyd_rounds(emb: DataFrame, rows, iters: int, vec_col: str,
                  cluster_of) -> list[tuple[int, list[float]]]:
    """Shared Lloyd loop: ``cluster_of(rows)`` yields the assignment
    Column (cosine argmax or L2 argmin); means recompute through
    DECIMAL(18,12) is identical for both metrics."""
    for _ in range(iters):
        # Two selects, not one: a generator (posexplode) in the same
        # projection as a struct-field access strips the struct's field
        # names during analysis (FIELD_NOT_FOUND col1/col2). Catalyst
        # collapses the adjacent projections, so the plan is identical.
        means = (
            emb.select(cluster_of(rows).alias("cluster"),
                       as_double(F.col(vec_col)).alias("__v"))
            .select("cluster",
                    F.posexplode("__v").alias("dim_idx", "component"))
            .groupBy("cluster", "dim_idx")
            .agg((F.sum(F.col("component").cast("decimal(18,12)"))
                  .cast("double") / F.count(F.lit(1))).alias("m"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(int(r["cluster"]), {})[int(r["dim_idx"])] = r["m"]
        rows = [
            (cid, [by_cluster[cid][d] for d in range(len(old))])
            if cid in by_cluster else (cid, old)
            for cid, old in rows
        ]
    return rows


def sqdist(a: Column, b: Column) -> Column:
    """Squared L2 distance, computed as dot(a−b, a−b): the diff list is
    materialized once and fed through the same left-to-right product
    fold as ``dot``, so DuckDB's ``list_dot_product`` over the same
    diff list is bit-identical (the property every PQ oracle below
    rests on)."""
    d = F.zip_with(as_double(a), as_double(b), lambda x, y: x - y)
    return dot(d, d)


def _centroid_dists(vec: Column | str,
                    rows: list[tuple[int, list[float]]]) -> Column:
    """array(struct(dist, c_id)) over the centroid list; array_min
    picks (lowest distance, then lowest centroid id) — same tie-break
    as ORDER BY dist ASC, c_id ASC. Small-K literal-tree regime, like
    _centroid_sims, and built through the same one-shot SQL parse
    (bit parity with the Column tree pinned in tests/test_ann.py)."""
    v = _sql_expr_of(vec)
    entries = []
    for cid, cvec in rows:
        c = _sql_vec_lit(cvec)
        entries.append(
            f"named_struct('dist', {_sql_sqdist(v, c)}, "
            f"'c_id', CAST({cid} AS BIGINT))")
    return F.expr("array(" + ", ".join(entries) + ")")


def _centroid_dists_columns(vec: Column,
                            rows: list[tuple[int, list[float]]]) -> Column:
    """Original Column-tree _centroid_dists, kept as the parity
    reference for the SQL fast path (never on a hot path)."""
    structs = []
    for cid, cvec in rows:
        lit = F.lit([float(x) for x in cvec])  # one literal node
        structs.append(F.struct(
            sqdist(vec, lit).alias("dist"),
            F.lit(cid).cast("bigint").alias("c_id")))
    return F.array(*structs)


def kmeans_train_l2(emb: DataFrame, k: int = 8, iters: int = 2,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    ) -> list[tuple[int, list[float]]]:
    """Euclidean variant of kmeans_train (assignment by squared-L2
    argmin instead of cosine argmax; identical deterministic seeding,
    decimal-exact means, empty-cluster carry-over). This is the metric
    product quantization needs: PQ approximates DISTANCES from
    reconstructed subvectors, so codewords must minimize L2
    reconstruction error, not angle."""
    rows = _centroid_rows(emb.orderBy(F.col(id_col).asc()).limit(k),
                          id_col, vec_col)
    return _lloyd_rounds(
        emb, rows, iters, vec_col,
        lambda r: F.array_min(_centroid_dists(F.col(vec_col), r))["c_id"])


def pq_train(emb: DataFrame, m: int = 4, k: int = 8, iters: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             ) -> list[list[tuple[int, list[float]]]]:
    """Product-quantization codebooks: split the vector into ``m``
    contiguous subspaces and train an independent L2 k-means codebook
    per subspace (k codewords each). Returns one centroid list per
    subspace; total driver-held state is m·k·(dim/m) floats — the same
    control-plane footprint argument as IVF centroids. m scans of the
    corpus per iteration round (one per subspace), each a slice
    projection + the narrow argmin pass."""
    dim = len(emb.select(vec_col).head()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sd = dim // m
    books = []
    for s in range(m):
        sub = emb.select(
            F.col(id_col),
            F.slice(F.col(vec_col), s * sd + 1, sd).alias(vec_col))
        books.append(kmeans_train_l2(sub, k=k, iters=iters,
                                     id_col=id_col, vec_col=vec_col))
    return books


def pq_encode(emb: DataFrame,
              codebooks: list[list[tuple[int, list[float]]]],
              id_col: str = "vec_id", vec_col: str = "embedding",
              ) -> DataFrame:
    """PQ encoding: each vector becomes ``m`` small codes (argmin-L2
    codeword per subspace, ties to the lowest code id) — 64 dims of
    float32 compress to m bytes-ish of codes. One narrow codegen'd
    projection; adds ``codes`` array<bigint>, keeps id and vector."""
    sd = len(codebooks[0][0][1])
    code_cols = []
    for s, rows in enumerate(codebooks):
        sub = F.slice(F.col(vec_col), s * sd + 1, sd)
        code_cols.append(F.array_min(_centroid_dists(sub, rows))["c_id"])
    return emb.select(F.col(id_col), F.col(vec_col),
                      F.array(*code_cols).alias("codes"))


def ivf_ann_probe(emb: DataFrame, centroids, probe_id: int,
                  k: int = 10, nprobe: int = 1, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """IVF probe: rank only the probe's ``nprobe`` nearest clusters by
    exact cosine — the coarse-quantization ANN path. Multi-probe
    (nprobe>1) recovers the recall a hard cluster boundary loses: the
    probe's top-n centroids are selected with the same narrow
    sort-descending pass, then candidates come from an equi-join on
    cluster (partition-prunable at scale, never a corpus scan).
    Columns: neighbor_id, cluster, cos_sim."""
    rows = _centroid_rows(centroids, id_col, vec_col)
    assigned = ivf_assign(emb, rows, id_col, vec_col)
    top_n = F.slice(F.reverse(F.array_sort(_centroid_sims(vec_col, rows))),
                    1, nprobe)
    probe = F.broadcast(
        emb.where(F.col(id_col) == probe_id)
        .select(F.col(vec_col).alias("__probe_vec"),
                F.explode(top_n).alias("__c"))
        .select("__probe_vec", (-F.col("__c.neg_id")).alias("cluster"))
    )
    return (
        assigned.join(probe, "cluster")
        .where(F.col(id_col) != probe_id)
        .select(F.col(id_col).alias("neighbor_id"), "cluster",
                cosine(F.col(vec_col), F.col("__probe_vec"))
                .alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "neighbor_id")
        .limit(k)
    )


def hyperplane_signs(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes: sign of plane p, dim d = parity of
    the first byte of md5(f"{p}:{d}"). Engine-independent (the oracle
    re-derives the same planes), and fixed across runs so bucket
    assignments are stable — a requirement for a persisted ANN index."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).digest()[0]
            row.append(1 if h & 1 else -1)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column | str, planes: list[list[int]]) -> Column:
    """Bucket id = Σ_p (dot(vec, plane_p) >= 0) · 2^p.

    Pass the COLUMN NAME (string) for the fast construction path: the
    whole bucket computation is then ONE JVM-parsed SQL expression
    (planes as a nested double-array literal, plane index folded by
    ``aggregate``) instead of n_planes × (zip_with + aggregate)
    Python-lambda Column trees — ~10× cheaper to build over py4j,
    which is real money when the bench constructs the plan per run.
    Bit-identical to the Column path (pinned in tests/test_ann.py):
    the per-plane dot is the same cast-to-double, left-to-right
    multiply-add fold, the sign test the same ``>= 0``, and the bit
    weights exact integers whose sum order cannot matter."""
    if not planes:
        raise ValueError("lsh_bucket needs at least one hyperplane")
    if isinstance(vec, str) and not re.match(r"^[A-Za-z_][A-Za-z0-9_]*$",
                                             vec):
        # qualified / exotic names: let F.col resolve them instead of
        # guessing at quoting inside the SQL string
        vec = F.col(vec)
    if isinstance(vec, str):
        arr = "array(" + ",".join(
            "array(" + ",".join(f"{float(s)}D" for s in row) + ")"
            for row in planes) + ")"
        return F.expr(
            f"cast(aggregate(sequence(0, {len(planes) - 1}), 0, "
            f"(acc, p) -> acc + if(aggregate(zip_with("
            f"transform(`{vec}`, x -> cast(x as double)), "
            f"element_at({arr}, p + 1), (x, y) -> x * y), 0D, "
            f"(a, v) -> a + v) >= 0D, shiftleft(1, p), 0)) as int)")
    bucket = None
    for p, signs in enumerate(planes):
        plane = F.lit([float(s) for s in signs])  # one literal node
        bit = F.when(dot(vec, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def lsh_ann_same_bucket(emb: DataFrame, probe_id: int, n_planes: int = 6,
                        dim: int = 64, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Approximate NN: candidates = vectors sharing the probe's
    hyperplane-sign bucket, ranked by exact cosine. The bucket column
    is what you'd bucketBy/partition the table on at scale.
    Columns: neighbor_id, bucket, cos_sim."""
    planes = hyperplane_signs(n_planes, dim)
    with_bucket = emb.select(
        F.col(id_col), F.col(vec_col),
        lsh_bucket(vec_col, planes).alias("bucket"),
    )
    probe = F.broadcast(
        with_bucket.where(F.col(id_col) == probe_id)
        .select(F.col(vec_col).alias("__probe_vec"),
                F.col("bucket").alias("__probe_bucket"))
    )
    return (
        with_bucket.crossJoin(probe)
        .where((F.col("bucket") == F.col("__probe_bucket"))
               & (F.col(id_col) != probe_id))
        .select(
            F.col(id_col).alias("neighbor_id"),
            "bucket",
            cosine(F.col(vec_col), F.col("__probe_vec")).alias("cos_sim"),
        )
    )


def lsh_ann_multiprobe(emb: DataFrame, probe_id: int, n_planes: int = 6,
                       dim: int = 64, k: int = 10,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       probe_src: DataFrame | None = None) -> DataFrame:
    """Multi-probe hyperplane LSH: candidates come from the probe's
    own bucket PLUS every Hamming-1 neighbor (one sign flip) — the
    standard recall fix for vectors that sit near a hyperplane. The
    probe row is exploded into its 1+n_planes candidate bucket ids and
    equi-joined on ``bucket``, so at scale this stays a bucket-pruned
    read of n_planes+1 buckets, never a corpus scan. Exact cosine
    ranks the candidate union; top-k returned.
    Columns: neighbor_id, bucket, cos_sim.

    ``probe_src`` (r14, guide §2.4/§6): where the probe row should be
    READ from when ``emb`` is itself a filtered/joined view that is
    known to contain the probe row. Passing the base table here turns
    the probe-side lookup into one pushed-down point filter on the
    scan instead of re-evaluating ``emb``'s whole lineage (e.g. a
    semi-join) just to find one row. Candidates always come from
    ``emb``. Results are identical whenever the probe row appears in
    both frames with the same vector."""
    planes = hyperplane_signs(n_planes, dim)
    with_bucket = emb.select(
        F.col(id_col), F.col(vec_col),
        lsh_bucket(vec_col, planes).alias("bucket"),
    )
    probe_base = with_bucket if probe_src is None else probe_src.select(
        F.col(id_col), F.col(vec_col),
        lsh_bucket(vec_col, planes).alias("bucket"),
    )
    masks = [0] + [1 << p for p in range(n_planes)]
    probe = F.broadcast(
        probe_base.where(F.col(id_col) == probe_id)
        .select(F.col(vec_col).alias("__probe_vec"),
                F.explode(F.array(*[
                    F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks
                ])).alias("bucket"))
    )
    return (
        with_bucket.join(probe, "bucket")
        .where(F.col(id_col) != probe_id)
        .select(
            F.col(id_col).alias("neighbor_id"),
            "bucket",
            cosine(F.col(vec_col), F.col("__probe_vec")).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "neighbor_id")
        .limit(k)
    )


def ivfpq_ann_probe(emb: DataFrame, centroids, codebooks, probe_id: int,
                    k: int = 10, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """The full FAISS-style IVF-PQ read path: coarse-quantize the
    corpus (IVF cluster), PQ-encode it, and answer a probe by scanning
    ONLY its cluster's codes with asymmetric distance (ADC): for each
    subspace the probe's slice is compared against the candidate's
    CODEWORD (not its raw vector), so the scan touches m bytes-ish per
    candidate instead of the full vector.

    ADC = Σ_s sqdist(probe_sub_s, codeword_s[code_s]), computed by
    indexing an array of per-codeword distances with the candidate's
    code — the m·k distance-table lookup FAISS precomputes, expressed
    as element_at over a codegen'd literal-array expression (same
    small-K regime as _centroid_sims). Exact cosine to the raw vector
    is returned beside the ADC for re-ranking.
    Columns: neighbor_id, cluster, adc, cos_exact (ranked by ADC)."""
    rows = _centroid_rows(centroids, id_col, vec_col)
    sd = len(codebooks[0][0][1])
    assigned = ivf_assign(emb, rows, id_col, vec_col)
    encoded = pq_encode(emb, codebooks, id_col, vec_col)
    corpus = assigned.join(
        encoded.select(id_col, "codes"), id_col)

    probe = F.broadcast(
        emb.where(F.col(id_col) == probe_id)
        .select(F.col(vec_col).alias("__probe_vec"))
    )
    pcluster = F.broadcast(
        ivf_assign(emb.where(F.col(id_col) == probe_id), rows,
                   id_col, vec_col)
        .select(F.col("cluster")))

    def sub(vec: Column, s: int) -> Column:
        return F.slice(vec, s * sd + 1, sd)

    adc_terms = []
    for s, book in enumerate(codebooks):
        dists = F.array(*[
            sqdist(sub(F.col("__probe_vec"), s),
                   F.lit([float(x) for x in cvec]))
            for _cid, cvec in book
        ])
        adc_terms.append(F.element_at(dists, (F.col("codes")[s] + 1).cast("int")))
    adc = adc_terms[0]
    for term in adc_terms[1:]:
        adc = adc + term

    return (
        corpus.join(pcluster, "cluster")
        .crossJoin(probe)
        .where(F.col(id_col) != probe_id)
        .select(F.col(id_col).alias("neighbor_id"), "cluster",
                # round to 9 dp: ADC inherits the codeword means'
                # decimal->double conversion, which can differ by 1 ulp
                # across engines once cluster sums carry ~16+ digits
                # (verify SKILL gotchas); argmins (codes) survive that,
                # raw distances don't
                F.round(adc, 9).alias("adc"),
                cosine(F.col(vec_col), F.col("__probe_vec"))
                .alias("cos_exact"))
        .orderBy("adc", "neighbor_id")
        .limit(k)
    )
