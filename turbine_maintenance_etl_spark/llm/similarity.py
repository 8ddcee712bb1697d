"""Similarity search over embedding columns (``array<float>``).

- ``brute_force_topk``: exact cosine top-k, query-side broadcast — the
  correctness baseline. O(Q x N) but fully distributed: candidates never
  shuffle, each partition scores its rows against the broadcast queries
  and emits only local top-k via the window rank.
- ``lsh_bucketed_topk``: the scale path — sign-random-projection (SRP)
  LSH. Each vector hashes to a bucket by the sign pattern of dot products
  with H fixed hyperplanes; queries probe only their own bucket
  (optionally multi-probe neighbors). Turns O(Q x N) into
  O(Q x N / 2^H) expected, with the bucket id as the join/shuffle key.

All vector math is `F.zip_with`/`F.aggregate` column expressions (JVM,
codegen) — no Python in the scoring loop. Deterministic: hyperplanes are
seeded; ranking ties break on candidate id.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from turbine_maintenance_etl_spark.llm.text import _IDENT_RE, sqlref
from turbine_maintenance_etl_spark.util import ensure_parallelism


def _dot_sql(a: str, b: str) -> str:
    """SQL text of the left-to-right dot product (single-parse
    construction — the vector-math builders in this module assemble one
    SQL string per call instead of paying py4j per operator: measured
    r10, one lambda bridge costs ~70 ms and ``F.lit`` of a 16×64 nested
    centroid matrix ~1 s, while parsing the equivalent SQL text costs
    ~5 ms; the analyzed plan — and therefore every result — is
    identical)."""
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"


def _norm_sql(a: str) -> str:
    return f"sqrt(aggregate({a}, 0.0D, (acc, v) -> acc + v * v))"


def _dlit(x: float) -> str:
    """Exact SQL double literal: repr() is the shortest round-trip
    decimal, and Java's Double.parseDouble is correctly rounded, so the
    parsed double is bit-identical to the Python float."""
    x = float(x)
    if x != x:
        return "double('NaN')"
    if x == float("inf"):
        return "double('Infinity')"
    if x == float("-inf"):
        return "double('-Infinity')"
    return repr(x) + "D"


def _vec_lit_sql(vals) -> str:
    return "array(" + ", ".join(_dlit(v) for v in vals) + ")"


def _mat_lit_sql(rows) -> str:
    return "array(" + ", ".join(_vec_lit_sql(r) for r in rows) + ")"


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column | str) -> Column:
    if isinstance(a, str) and _IDENT_RE.match(a):
        return F.expr(_norm_sql(sqlref(a)))
    if isinstance(a, str):
        a = F.col(a)
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine similarity between two double-array columns; NULL when
    either norm is zero."""
    return _dot(a, b) / F.nullif(_norm(a) * _norm(b), F.lit(0.0))


def as_double_array(col: Column | str) -> Column:
    if isinstance(col, str) and _IDENT_RE.match(col):
        return F.expr(f"transform({sqlref(col)}, x -> cast(x as double))")
    if isinstance(col, str):
        col = F.col(col)
    return F.transform(col, lambda x: x.cast("double"))


def _pair_cosine(
    qv: str = "_qv", cv: str = "_cv", qn: str = "_qn", cn: str = "_cn"
) -> Column:
    """Rounded pair cosine over precomputed per-row norm columns riding
    the join: dot(qv,cv)/(qn*cn). Same doubles as ``cosine_expr`` —
    only WHERE the norms are computed moves — but the per-pair work
    drops from three interpreted O(dim) aggregates to one (HOFs are
    CodegenFallback, so this is the top-k family's hot loop)."""
    return F.expr(
        f"round({_dot_sql(sqlref(qv), sqlref(cv))} "
        f"/ nullif({sqlref(qn)} * {sqlref(cn)}, 0.0D), 6)"
    )


def _nonzero_vectors(df: DataFrame, vec_alias: str) -> DataFrame:
    """Drop NULL and zero-norm vectors before scoring/bucketing: they
    have no cosine to anything (``cosine_expr`` yields NULL), so left in
    they surface as rank-k 'neighbors' with NULL scores, crash the
    numpy-batched PQ kernels (np.stack over a None element), and — the
    scale hazard — deterministically collide into ONE SRP bucket (every
    plane dot is 0/NULL), turning e.g. millions of empty-text embeddings
    into a quadratic mega-bucket."""
    # ~isnan: a vector with a NaN element has norm NaN, and NaN > 0 is
    # TRUE under Spark's (and DuckDB's) NaN-is-largest comparison
    # semantics — left in, its NaN cosine ranks FIRST in every DESC
    # top-k and the corrupt vector becomes everyone's nearest neighbor
    # (r10 adversarial sweep). The norm lands in a projection so the
    # interpreted O(dim) aggregate runs once per row, not per predicate.
    v = sqlref(vec_alias)
    return (
        df.withColumn("_vnorm", _norm(vec_alias))
        .filter(F.expr(f"({v} IS NOT NULL) AND (NOT isnan(`_vnorm`)) AND (`_vnorm` > 0)"))
        .drop("_vnorm")
    )


def _guard_query_count(queries: DataFrame, max_queries: int | None, op: str) -> None:
    """The topk paths BROADCAST the query frame — fine for the
    small-query-set contract, catastrophic for a corpus-sized query side
    (the 8 GB broadcast limit / driver OOM). One count job on the (small
    by contract) query side enforces the contract loudly."""
    if max_queries is None:
        return
    n_q = queries.count()
    if n_q > max_queries:
        raise ValueError(
            f"{op} got {n_q} query vectors (> {max_queries}): the query side "
            "is broadcast, so a corpus-sized query set must be restructured "
            "(batch the queries, or self-join via semantic_dedup's bucketed "
            "shape); pass max_queries=None to force it"
        )


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    max_queries: int = 10_000,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` must have columns (query_id_col, vec_col); broadcast it
    (small side). Excludes self-matches when ids collide. Scores are
    rounded to 6 dp *before* ranking so the ordering is reproducible
    across engines; ties break on candidate id.

    This is the O(Q x N) CORRECTNESS BASELINE, guarded so it cannot be
    misused as the scale path: the query side must fit ``max_queries``
    (it is broadcast and multiplies the candidate scan). For large Q use
    ``lsh_bucketed_topk`` / ``ivf_topk``; the count costs one job on the
    (small by contract) query side. Pass ``max_queries=None`` to skip
    the guard in controlled benchmarks.
    """
    _guard_query_count(queries, max_queries, "brute_force_topk")
    # per-row norms ride the join as columns (computed BEFORE the
    # broadcast hint so the hinted subtree carries them): the per-pair
    # cosine then pays ONE O(dim) interpreted aggregate (the dot
    # product) instead of three — identical doubles, a row's norm
    # doesn't depend on where it's computed
    q = F.broadcast(
        _nonzero_vectors(
            queries.select(
                F.col(query_id_col), as_double_array(vec_col).alias("_qv")
            ),
            "_qv",
        ).withColumn("_qn", _norm("_qv"))
    )
    c = _nonzero_vectors(
        ensure_parallelism(candidates).select(
            F.col(id_col).alias("neighbor_id"),
            as_double_array(vec_col).alias("_cv"),
        ),
        "_cv",
    ).withColumn("_cn", _norm("_cv"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("cosine", _pair_cosine())
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def inverted_index_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    group_col: str | None = None,
    max_queries: int = 10_000,
) -> DataFrame:
    """Sparse dot-product top-k via an INVERTED INDEX over vector
    components — the classic sparse-retrieval plan (Lucene/impact-index
    shape), expressed relationally.

    Both sides posexplode their vectors into (id, component, weight)
    rows with zero weights dropped; a broadcast equi-join on the
    component index + a (query, candidate) sum-aggregate computes every
    dot product that can be non-structurally-zero. Pairs sharing no
    non-zero component are never materialized — for sparse vectors this
    is O(nnz_q x avg_postings) instead of brute force's O(Q x N x dim).

    Weights are cast to BIGINT (the hashing encoder with
    ``normalize=False`` emits exact small integers), so scores are
    integer-exact across engines — no float rounding anywhere. Pairs
    must score > 0 to rank (a dot that cancels to 0 carries no
    similarity evidence); ties break on candidate id.

    Scale: the candidate posting list is the big side and NEVER
    shuffles — the query side is broadcast (and guarded), so the join
    preserves candidate partitioning and the only wide operator in the
    plan is the (query_id, neighbor_id) score aggregate, which
    partial-aggregates map-side before its single exchange; the top-k
    window then prunes via WindowGroupLimit (plan-verified in
    tests/test_retrieval_ops.py). ``group_col`` (e.g. the parent doc of
    a chunk) excludes same-group matches — retrieval must not answer a
    chunk with its own document.
    """
    _guard_query_count(queries, max_queries, "inverted_index_topk")

    def _int_weight(w: Column) -> Column:
        # loud integer contract (r10 review): a silent cast('bigint')
        # truncated float weights (0.7 -> 0), returning empty/wrong
        # results for callers passing normalized vectors; raise at
        # execution instead
        return F.when(w == F.floor(w), w.cast("bigint")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "inverted_index_topk requires integer weights "
                        "(hashing encoder with normalize=False); got "
                    ),
                    w.cast("string"),
                )
            )
        )

    q_extra = [F.col(group_col).alias("_qg")] if group_col else []
    c_extra = [F.col(group_col).alias("_cg")] if group_col else []
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.posexplode(vec_col).alias("_comp", "_w"), *q_extra
        )
        .filter(F.col("_w") != 0.0)
        .select(
            query_id_col,
            "_comp",
            _int_weight(F.col("_w")).alias("_qw"),
            *(["_qg"] if group_col else []),
        )
    )
    c = (
        ensure_parallelism(candidates)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.posexplode(vec_col).alias("_comp", "_w"),
            *c_extra,
        )
        .filter(F.col("_w") != 0.0)
        .withColumn("_cw", _int_weight(F.col("_w")))
    )
    # the id self-match filter applies ALWAYS (r10 review: with
    # group_col it was skipped, so a row sharing the query's id but not
    # its group came back as its own neighbor); the group exclusion is
    # SQL <> semantics — a NULL group matches nothing and such rows are
    # excluded from group-filtered retrieval, the same rows the DuckDB
    # twin's <> drops (callers wanting NULL-group rows retrievable
    # should coalesce a sentinel group first)
    joined = c.join(q, "_comp").filter(
        F.col("neighbor_id") != F.col(query_id_col)
    )
    if group_col:
        joined = joined.filter(F.col("_cg") != F.col("_qg"))
    scored = (
        joined.groupBy(query_id_col, "neighbor_id")
        .agg(F.sum(F.col("_qw") * F.col("_cw")).alias("score"))
        .filter(F.col("score") > 0)
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "score", "rank")
    )


def random_hyperplanes(dim: int, num_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Seeded Gaussian hyperplanes for SRP-LSH, as plain literals so the
    same planes embed into any engine's SQL (oracle parity)."""
    rng = random.Random(seed)
    return [
        [round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)] for _ in range(num_planes)
    ]


def srp_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: bit i = (vec . plane_i) >= 0.

    The plane matrix embeds as ONE nested-array literal traversed with
    an indexed ``transform`` — not one expression subtree per plane. A
    per-plane literal forest (planes x dim Literal nodes) made Catalyst
    analysis + codegen the dominant cost of every fresh query at small
    scale; the single-literal form plans in milliseconds and executes
    identically (still JVM-side, still a map-only pass).

    Buckets are BIGINT: an int accumulator saturates at plane 31
    (pow(2,31) casts to 2^31-1 under the repo's ANSI-off session) and
    silently collides/splits sign patterns — auto_num_planes reaches 32
    near 1e12 vectors, squarely inside the design range. Plane counts
    past 52 would exceed the double-exact integer range feeding the
    cast, so they are rejected."""
    if len(planes) > 52:
        raise ValueError(
            f"num_planes={len(planes)} > 52: bucket ids are built from "
            "exact powers of two in a double (2^53 ceiling) — use fewer "
            "planes (2^52 buckets is far past any corpus)"
        )
    vec_sql = sqlref(vec) if isinstance(vec, str) else None
    if vec_sql is None:
        lit_planes = F.lit([[float(v) for v in p] for p in planes])
        contrib = F.transform(
            lit_planes,
            lambda p, i: F.when(
                _dot(vec, p) >= 0, F.pow(F.lit(2.0), i).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint")),
        )
        return F.aggregate(
            contrib, F.lit(0).cast("bigint"), lambda acc, v: acc + v
        ).cast("bigint")
    # single-parse construction (see _dot_sql): the plane matrix embeds
    # as SQL literal text — constant-folded to the identical nested-array
    # Literal the F.lit path produced
    contrib = (
        f"transform({_mat_lit_sql([[float(v) for v in p] for p in planes])}, "
        f"(p, i) -> CASE WHEN {_dot_sql(vec_sql, 'p')} >= 0 "
        "THEN cast(pow(2.0D, i) as bigint) ELSE cast(0 as bigint) END)"
    )
    return F.expr(
        f"cast(aggregate({contrib}, cast(0 as bigint), (acc, v) -> acc + v) as bigint)"
    )


def lsh_bucketed_topk(
    candidates: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    max_queries: int | None = 500_000,
) -> DataFrame:
    """Approximate top-k: SRP-bucket both sides, equi-join on the bucket
    id (the shuffle key — replaces the cross join), exact cosine within
    buckets, window top-k. Recall < 1 by construction; raise recall via
    fewer planes or multi-probe. The query side is broadcast and guarded
    by ``max_queries`` (the scale axis this path buys is candidate-side
    N, not Q)."""
    _guard_query_count(queries, max_queries, "lsh_bucketed_topk")
    planes = random_hyperplanes(dim, num_planes, seed)
    c = (
        _nonzero_vectors(
            ensure_parallelism(candidates).select(
                F.col(id_col).alias("neighbor_id"),
                as_double_array(vec_col).alias("_cv"),
            ),
            "_cv",
        )
        .withColumn("bucket", srp_bucket_expr("_cv", planes))
        .withColumn("_cn", _norm("_cv"))
    )
    q = (
        _nonzero_vectors(
            queries.select(
                F.col(query_id_col), as_double_array(vec_col).alias("_qv")
            ),
            "_qv",
        )
        .withColumn("bucket", srp_bucket_expr("_qv", planes))
        .withColumn("_qn", _norm("_qv"))
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("cosine", _pair_cosine())
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def _centroid_dists(vec: str, centroids: list[list[float]]) -> str:
    """array<struct<d,cid>> of squared-L2 distances to literal centroids
    — pure column expressions, so assignment is a codegen map pass.

    The centroid matrix is ONE nested-array literal walked by an indexed
    ``transform`` (one small expression tree), not n_clusters separate
    struct/aggregate subtrees each inlining dim Literal nodes — the
    latter made Catalyst analysis + codegen compile time dominate every
    fresh ANN query (~4 s at 16x64) while producing the identical
    physical work. Built as single-parse SQL text (see _dot_sql): the
    F.lit of the same matrix alone cost ~1 s of py4j marshalling per
    call, the lambda bridge another ~0.5 s."""
    vec_sql = sqlref(vec)
    mat = _mat_lit_sql([[float(v) for v in ctr] for ctr in centroids])
    sq = (
        f"aggregate(zip_with({vec_sql}, c, (x, y) -> (x - y) * (x - y)), "
        "0.0D, (acc, v) -> acc + v)"
    )
    return f"transform({mat}, (c, i) -> named_struct('d', {sq}, 'cid', i))"


def _collect_train_sample(
    df: DataFrame, id_alias: str, vec_alias: str, max_train_vectors: int,
    op: str = "trainer",
):
    """Bounded deterministic PSEUDO-RANDOM training sample: TakeOrdered
    on xxhash64(id) (one Spark job, driver memory capped at
    max_train_vectors x dim doubles). Hash order matters: ids usually
    encode ingest order, so 'lowest max_train_vectors ids' would train
    the quantizer/PCA exclusively on the corpus's oldest shard and
    silently misrepresent a drifted distribution. NULL vectors are
    excluded; an empty sample raises instead of crashing in numpy."""
    import numpy as np

    rows = (
        df.filter(F.col(vec_alias).isNotNull())
        .orderBy(F.xxhash64(id_alias), id_alias)
        .limit(max_train_vectors)
        .select(vec_alias)
        .collect()
    )
    if not rows:
        raise ValueError(f"{op}: no non-NULL vectors to train on")
    return np.array([r[vec_alias] for r in rows], dtype=np.float64)


def _kmeans_lloyd(X, k: int, max_iter: int, seed: int):
    """Seeded Lloyd's k-means on an in-memory sample (numpy): the coarse
    quantizer trains on at most ``max_train_vectors`` rows, so driver
    memory is bounded and training costs ZERO Spark jobs beyond the one
    sample-collect (an MLlib fit here would run ~2 jobs per iteration of
    fixed scheduling overhead over a tiny sample — the FAISS design
    trains in memory for the same reason). Distances use the
    x^2 + c^2 - 2xC' expansion: O(n*k) memory, never an (n,k,dim) cube."""
    import numpy as np

    rng = np.random.default_rng(seed)
    k = min(k, len(X))
    centers = X[rng.choice(len(X), size=k, replace=False)].copy()
    x_sq = (X**2).sum(1)[:, None]
    prev = None
    for _ in range(max_iter):
        d = x_sq + (centers**2).sum(1)[None, :] - 2.0 * (X @ centers.T)
        assign = d.argmin(1)
        # vectorized center update (round-6 verdict item 4: the old
        # per-cluster boolean-mask loop was ~3s of pure Python overhead
        # per PQ training at m=16 subspaces x 64-256 codewords)
        counts = np.bincount(assign, minlength=k)
        sums = np.zeros_like(centers)
        np.add.at(sums, assign, X)
        live = counts > 0
        centers[live] = sums[live] / counts[live, None]
        for j in np.flatnonzero(~live):  # dead centroid: reseed randomly
            centers[j] = X[rng.integers(len(X))]
        # converged (stable assignment, no reseeds): further iterations
        # recompute identical centers — exit without changing the output
        if prev is not None and live.all() and np.array_equal(assign, prev):
            break
        prev = assign
    return centers


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    train_fraction: float = 1.0,
    max_iter: int = 6,
    max_train_vectors: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    max_queries: int | None = 500_000,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    path (FAISS IVF-Flat shape, on Spark):

    1. TRAIN: seeded in-memory k-means on a bounded sample of candidates
       (``train_fraction`` sample, capped at ``max_train_vectors`` —
       at 100 TB you train the quantizer on ~1e5-1e6 sampled vectors,
       never the full corpus; the cap bounds driver memory to
       max_train_vectors x dim doubles).
    2. ASSIGN: the trained centroids (tiny: n_clusters x dim) embed as
       literal arrays; each candidate maps to its nearest centroid via
       an argmin expression — map-only, codegen, no Python and no
       second shuffle.
    3. PROBE: each query expands to its ``n_probe`` nearest centroids,
       then an equi-join on the cluster id (queries broadcast) scores
       exact cosine only inside probed clusters: O(Q x N x n_probe /
       n_clusters) instead of O(Q x N).

    Recall < 1 by construction; raise ``n_probe`` to trade compute for
    recall. Deterministic given ``seed`` (sample rows are taken in
    id-HASH order — a deterministic pseudo-random sample, so a corpus
    whose ids encode ingest order doesn't train the quantizer on its
    oldest shard only; Lloyd's is seeded numpy). Not SQL-expressible
    (iterative k-means) -> registry records the weaker rows-only check;
    recall vs
    brute force is pytest-asserted instead."""
    _guard_query_count(queries, max_queries, "ivf_topk")
    c = _nonzero_vectors(
        ensure_parallelism(candidates).select(
            F.col(id_col).alias("neighbor_id"),
            as_double_array(vec_col).alias("_cv"),
        ),
        "_cv",
    )
    train = c if train_fraction >= 1.0 else c.sample(train_fraction, seed=seed)
    X = _collect_train_sample(train, "neighbor_id", "_cv", max_train_vectors, "ivf_topk")
    centroids = [
        [float(x) for x in ctr] for ctr in _kmeans_lloyd(X, n_clusters, max_iter, seed)
    ]

    cc = c.withColumn(
        "_cid",
        # never-firing coalesce(-1): a nullable join key makes the
        # inner join's isnotnull(key) constraint inline the whole
        # centroid argmin a SECOND time into the scan filter (plan-
        # verified on the sampled-IVF sibling); provably non-null keys
        # fold the constraint away so assignment runs exactly once
        F.expr(
            "coalesce(sort_array("
            + _centroid_dists("_cv", centroids)
            + ")[0].cid, -1)"
        ),
    ).withColumn("_cn", _norm("_cv"))
    q = (
        _nonzero_vectors(
            queries.select(
                F.col(query_id_col), as_double_array(vec_col).alias("_qv")
            ),
            "_qv",
        )
        .withColumn(
            "_cid",
            F.explode(
                F.expr(
                    "transform(slice(sort_array("
                    + _centroid_dists("_qv", centroids)
                    + f"), 1, {n_probe}), s -> s.cid)"
                )
            ),
        )
        .withColumn("_qn", _norm("_qv"))
    )
    scored = (
        cc.join(F.broadcast(q), "_cid")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("cosine", _pair_cosine())
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def _seq_norm(v: list[float]) -> float:
    """sqrt of a LEFT-TO-RIGHT float64 accumulation — the identical IEEE
    op sequence Spark's aggregate and DuckDB's list_dot_product execute,
    so an oracle recomputing sqrt(list_dot_product(cv,cv)) from data
    sees the SAME double."""
    import math

    acc = 0.0
    for x in v:
        acc += x * x
    return math.sqrt(acc)


def _sampled_cos_structs_sql(
    vec_sql: str, centroids: list[list[float]], ctr_norms: list[float]
) -> str:
    """SQL text of ``_sampled_cos_structs`` (single-parse construction —
    the F.lit of the centroid matrix alone cost ~1 s per call)."""
    n_c = len(centroids)
    cent = _mat_lit_sql(centroids)
    norms = _vec_lit_sql(ctr_norms)
    struct = (
        f"named_struct('cs', round({_dot_sql(vec_sql, 'ctr')} "
        f"/ nullif(nv * element_at({norms}, i + 1), 0.0D), 6), "
        f"'rc', {n_c - 1} - i)"
    )
    return (
        f"transform(array({_norm_sql(vec_sql)}), nv -> "
        f"transform({cent}, (ctr, i) -> {struct}))[0]"
    )


def ivf_sampled_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    max_queries: int | None = 500_000,
) -> DataFrame:
    """IVF-Flat over cosine geometry with a HASH-SAMPLED coarse
    quantizer — the exactly-SQL-checkable member of the IVF family.

    FAISS seeds k-means from a random corpus sample; this variant STOPS
    at the seeding step: centroids are the ``n_clusters`` vectors first
    in (md5(id), id) order — a deterministic pseudo-random sample (the
    ``_collect_train_sample`` doctrine, in a hash portable to any
    engine's SQL). Unlike the Lloyd-refined ``ivf_topk``/``ivfpq_topk``,
    the WHOLE path — centroid pick, nearest-centroid assignment, query
    probing, scoring — is reproducible value-for-value by a DuckDB
    oracle twin. The price is quantizer quality (no refinement → less
    balanced cells, lower recall at equal ``n_probe``; pytest pins the
    floor). The plan shape is IDENTICAL to ``ivf_topk``'s: one bounded
    driver collect (n_clusters × dim doubles), literal-centroid argmax
    assignment (map-only codegen), probe-cluster equi-join against the
    broadcast query side — so the 100 TB story carries over unchanged.

    Assignment maximizes the ROUNDED (6 dp) cosine with ties to the
    lowest centroid id — the same cross-engine determinism contract
    every similarity entry uses. The tie-break rides inside one struct
    array as ``rc = n_clusters-1-cid`` so ``array_max``/``sort_array``
    pick max cosine THEN min cid without a float negation (−0.0 vs 0.0
    ordering differs across engines)."""
    _guard_query_count(queries, max_queries, "ivf_sampled_topk")
    c = _nonzero_vectors(
        ensure_parallelism(candidates).select(
            F.col(id_col).alias("neighbor_id"),
            as_double_array(vec_col).alias("_cv"),
        ),
        "_cv",
    )
    # bounded deterministic collect: n_clusters rows in hash order
    ctr_rows = (
        c.orderBy(F.md5(F.col("neighbor_id").cast("string")), "neighbor_id")
        .limit(n_clusters)
        .select("_cv")
        .collect()
    )
    if not ctr_rows:
        # an index over zero usable vectors has no neighbors to return —
        # match brute_force_topk's empty result (same schema, statically
        # empty) instead of raising, so compositions over a filtered-out
        # corpus slice degrade the way the rest of the family does
        return (
            queries.select(F.col(query_id_col))
            .filter(F.lit(False))
            .withColumn(
                "neighbor_id", F.lit(None).cast(candidates.schema[id_col].dataType)
            )
            .withColumn("cosine", F.lit(None).cast("double"))
            .withColumn("rank", F.lit(None).cast("bigint"))
        )
    centroids = [[float(x) for x in r["_cv"]] for r in ctr_rows]
    n_c = len(centroids)
    # centroid norms as literals (see _seq_norm): computing them per row
    # was 2 of the 3 O(dim) aggregates in the hot interpreted-HOF path
    # (HOFs are CodegenFallback).
    ctr_norms = [_seq_norm(ctr) for ctr in centroids]

    def _cos_structs_sql(vec_sql: str) -> str:
        return _sampled_cos_structs_sql(vec_sql, centroids, ctr_norms)

    # per-row norms ride the join as a column so the in-cluster scoring
    # pays ONE interpreted O(dim) aggregate per PAIR (the dot product)
    # instead of three — same doubles, the norm of a row doesn't depend
    # on where it's computed. The assignment is wrapped in a
    # never-firing coalesce(-1): the raw expression is NULLABLE, so the
    # inner join's isnotnull(key) constraint inlines the ENTIRE 16-dot
    # argmax a second time into the scan filter (verified in the
    # physical plan — the ivfpq double-eval pathology in expression
    # form); coalesce with a literal is provably non-null, so Catalyst
    # folds the constraint away and assignment runs exactly once.
    cc = c.withColumn(
        "_cid",
        F.expr(
            f"coalesce({n_c - 1} - array_max({_cos_structs_sql('`_cv`')}).rc, -1)"
        ),
    ).withColumn("_cn", _norm("_cv"))
    q = _nonzero_vectors(
        queries.select(
            F.col(query_id_col), as_double_array(vec_col).alias("_qv")
        ),
        "_qv",
    ).withColumn(
        "_cid",
        F.explode(
            F.expr(
                f"transform(slice(reverse(sort_array({_cos_structs_sql('`_qv`')})), "
                f"1, {n_probe}), s -> {n_c - 1} - s.rc)"
            )
        ),
    ).withColumn("_qn", _norm("_qv"))
    scored = (
        cc.join(F.broadcast(q), "_cid")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("cosine", _pair_cosine())
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def auto_num_planes(n: int, target_bucket_size: int = 500) -> int:
    """SRP plane count for an N-vector corpus: ceil(log2(N / target))
    with a floor of 4 — bucket count must GROW with the corpus or
    in-bucket verification degrades as N^2/buckets (measured 20x at
    fixed planes in the 8x scale probe)."""
    import math

    return max(4, math.ceil(math.log2(max(n / target_bucket_size, 2))))


def semantic_dedup(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.45,
    num_planes: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
    target_bucket_size: int = 500,
) -> DataFrame:
    """Semantic (embedding-space) deduplication — the SemDeDup shape
    (Abbas et al. 2023): bucket vectors with SRP-LSH, verify cosine only
    between bucket-mates, resolve the >= threshold pairs into connected
    components, and keep one survivor (min id) per component.

    Output: (id, cluster_id, survivor) for EVERY input vector —
    unclustered vectors are their own cluster. Downstream drops
    ``survivor = false`` rows.

    Scale shape: the bucket id is the only join key (no all-pairs
    cross join) — O(sum of bucket^2) verification. THE load-bearing
    knob is that bucket count must GROW with the corpus: with fixed
    planes, buckets average N/2^planes docs and in-bucket verification
    goes quadratic in N (the 8x scale probe measured 20x wall-clock at
    fixed 4 planes vs 1.5x once planes scale). ``num_planes=None``
    (default) auto-sizes to ceil(log2(N / target_bucket_size)) via one
    count job; pass an explicit value only when the oracle/bucket
    layout must stay pinned. ``max_bucket_size`` is the safety valve
    for residual mega-buckets (mass exact duplication — which
    exact-dedup should have removed first, same doctrine as the LSH
    cap). Recall < 1 by construction (true near-dups split across
    buckets are missed); raise recall with fewer planes or multi-probe,
    trade verification cost. SemDeDup's original formulation buckets by
    k-means cluster; SRP buckets keep the operator deterministic,
    literal-seeded, and exactly oracle-checkable in SQL, while
    ``ivf_topk``'s trained quantizer remains the alternative bucketing
    for skewed corpora."""
    if num_planes is None:
        num_planes = auto_num_planes(emb.count(), target_bucket_size)
    from turbine_maintenance_etl_spark.llm.dedup import resolve_duplicate_clusters

    planes = random_hyperplanes(dim, num_planes, seed)
    # NULL/zero vectors are excluded from bucketing (they'd ALL collide
    # into one bucket — e.g. millions of empty-text embeddings forming a
    # quadratic mega-bucket whose every cosine is NULL anyway); they
    # still appear in the output as their own singleton clusters via the
    # final left join against the full input
    base = _nonzero_vectors(
        ensure_parallelism(emb).select(
            F.col(id_col), as_double_array(vec_col).alias("_v")
        ),
        "_v",
    ).withColumn("_bucket", srp_bucket_expr("_v", planes))
    if max_bucket_size is not None:
        # window count over _bucket reuses the bucket shuffle instead of
        # a self-join against an aggregate of base, which would execute
        # the scan + SRP hashing a second time (the run-once doctrine
        # minhash_lsh_candidates documents)
        w_sz = Window.partitionBy("_bucket")
        base = (
            base.withColumn("_sz", F.count("*").over(w_sz))
            .filter(F.col("_sz") <= max_bucket_size)
            .drop("_sz")
        )
    # per-row norm rides the bucket shuffle (8 bytes/row) so in-bucket
    # verification pays one interpreted O(dim) aggregate per PAIR, not
    # three — the _pair_cosine doubles are identical
    base = base.withColumn("_n", _norm("_v"))
    a = base.select(
        F.col(id_col).alias("id_a"), F.col("_v").alias("_va"),
        F.col("_n").alias("_na"), "_bucket",
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"), "_bucket",
    )
    # NO broadcast hint: b is the FULL corpus (unlike the topk paths,
    # where the broadcast side is a small query set) — the bucket
    # equi-join shuffles both sides on the bucket key, which is the
    # scale shape the docstring describes
    pairs = (
        a.join(b, "_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("_cos", _pair_cosine(qv="_va", cv="_vb", qn="_na", cn="_nb"))
        .filter(F.col("_cos") >= threshold)
        .select("id_a", "id_b")
    )
    clusters = resolve_duplicate_clusters(pairs)
    return (
        emb.select(F.col(id_col))
        .join(
            clusters.select(
                F.col("doc_id").alias(id_col), F.col("cluster_id").alias("_cl")
            ),
            [id_col],
            "left",
        )
        .select(
            F.col(id_col),
            F.coalesce("_cl", F.col(id_col)).alias("cluster_id"),
            (F.coalesce("_cl", F.col(id_col)) == F.col(id_col)).alias("survivor"),
        )
    )


def lsh_multiprobe_topk(
    candidates: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    max_queries: int | None = 500_000,
) -> DataFrame:
    """Multi-probe SRP top-k: each query probes its own bucket PLUS all
    Hamming-distance-1 neighbors (one sign bit flipped) — the standard
    multi-probe LSH recall lever (Lv et al. 2007). A near neighbor that
    lands across one hyperplane from the query is recovered at the cost
    of probing ``1 + num_planes`` buckets instead of one; candidate-side
    hashing, storage, and the bucket equi-join shape are IDENTICAL to
    single-probe (only the broadcast query side fans out), so recall
    rises without touching the index. No dedup pass is needed: each
    candidate lives in exactly one bucket and a query's probe values
    are pairwise-distinct integers, so every (query, candidate) pair
    joins through at most one probe row by construction."""
    _guard_query_count(queries, max_queries, "lsh_multiprobe_topk")
    planes = random_hyperplanes(dim, num_planes, seed)
    c = (
        _nonzero_vectors(
            ensure_parallelism(candidates).select(
                F.col(id_col).alias("neighbor_id"),
                as_double_array(vec_col).alias("_cv"),
            ),
            "_cv",
        )
        .withColumn("bucket", srp_bucket_expr("_cv", planes))
        .withColumn("_cn", _norm("_cv"))
    )
    # compute the base bucket ONCE per query row, then derive the probe
    # set from the column reference — inlining the SRP expression into
    # every array slot would pay (1+H) x H x dim multiplications per row
    q = (
        _nonzero_vectors(
            queries.select(
                F.col(query_id_col), as_double_array(vec_col).alias("_qv")
            ),
            "_qv",
        )
        .withColumn("_b", srp_bucket_expr("_qv", planes))
        .withColumn("_qn", _norm("_qv"))
        .select(
            query_id_col,
            "_qv",
            "_qn",
            F.explode(
                F.expr(
                    "array(" + ", ".join(
                        ["`_b`"] + [f"`_b` ^ {1 << i}" for i in range(num_planes)]
                    ) + ")"
                )
            ).alias("bucket"),
        )
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("cosine", _pair_cosine())
        .select(query_id_col, "neighbor_id", "cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


# --- Product quantization (FAISS PQ shape) ---------------------------------


def fit_pq(
    candidates: DataFrame,
    dim: int,
    m: int = 8,
    nbits: int = 4,
    seed: int = 42,
    max_iter: int = 8,
    max_train_vectors: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train product-quantization codebooks (FAISS PQ): split the vector
    into ``m`` subspaces of dim/m and run seeded in-memory k-means with
    2^nbits centroids PER SUBSPACE on a bounded deterministic sample
    (same driver-memory contract as the IVF trainer). Returns
    ``codebooks[m][2^nbits][dim/m]``.

    Why PQ at 100 TB: an fp32 index is 4*dim bytes/vector (256 B at
    dim=64); PQ codes are m*nbits bits (4 B here) — a 64x memory cut
    that turns a cluster-wide ANN index into something one executor
    core's cache can scan. The codebooks themselves are tiny
    (m * 2^nbits * dim/m floats) and embed as plan literals."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    dsub, ksub = dim // m, 1 << nbits
    # _nonzero_vectors (r10 review): the scoring side filters NULL and
    # zero-norm vectors, so the trainer must too — a vector with a NULL
    # ELEMENT passes isNotNull but crashes np.array on the driver, and
    # zero-norm vectors would pull centroids toward a population the
    # encoder never scores (same filter ivf_topk/fit_pq_sampled use)
    X = _collect_train_sample(
        _nonzero_vectors(
            ensure_parallelism(candidates).select(
                F.col(id_col), as_double_array(vec_col).alias("_v")
            ),
            "_v",
        ),
        id_col,
        "_v",
        max_train_vectors,
        "fit_pq",
    )
    books = []
    for s in range(m):
        sub = X[:, s * dsub : (s + 1) * dsub]
        centers = _kmeans_lloyd(sub, ksub, max_iter, seed + s)
        books.append([[float(x) for x in c] for c in centers])
    return books



def fit_pq_sampled(
    candidates: DataFrame,
    dim: int,
    m: int = 16,
    nbits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """PQ codebooks from a HASH-SAMPLED corpus slice — ``fit_pq``
    without the Lloyd refinement: codeword ``j`` of subspace ``s`` is
    sample vector ``j``'s ``s``-th subvector, where the sample is the
    first ``2^nbits`` non-zero vectors in (md5(id), id) order. The same
    trade as ``ivf_sampled_topk``: quantizer quality for exact
    cross-engine checkability — every codeword is a value-for-value
    slice of corpus data an SQL twin can re-derive, so the WHOLE
    encode→reconstruct→score path becomes oracle-checkable (k-means
    codebooks never are). Same bounded-collect contract as fit_pq
    (2^nbits × dim doubles)."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    dsub, ksub = dim // m, 1 << nbits
    c = _nonzero_vectors(
        ensure_parallelism(candidates).select(
            F.col(id_col).alias("neighbor_id"),
            as_double_array(vec_col).alias("_cv"),
        ),
        "_cv",
    )
    rows = (
        c.orderBy(F.md5(F.col("neighbor_id").cast("string")), "neighbor_id")
        .limit(ksub)
        .select("_cv")
        .collect()
    )
    if not rows:
        raise ValueError("fit_pq_sampled: no non-NULL, non-zero vectors")
    return [
        [[float(x) for x in r["_cv"][s * dsub : (s + 1) * dsub]] for r in rows]
        for s in range(m)
    ]


def _assign_nearest(X, C):
    """Nearest-centroid assignment via the x^2 + c^2 - 2xC' expansion:
    an (n, k) distance matrix, never the (n, k, dim) float64 cube — the
    cube is ~15.7 GB per 10k-row Arrow batch at (256 clusters, dim 768),
    the same OOM _kmeans_lloyd and _pq_codes already avoid."""
    import numpy as np

    d = (
        (X**2).sum(1)[:, None]
        + (C**2).sum(1)[None, :]
        - 2.0 * (X @ C.T)
    )
    return d.argmin(1)


def _pq_codes(X, B):
    """Chunked per-subspace argmin: X (n, m, dsub) against codebooks B
    (m, k, dsub) -> int32 codes (n, m). Chunks rows so the broadcasted
    (rows, m, k, dsub) float64 difference cube stays ~64 MB — the dsub
    factor must be in the divisor or the real cube is dsub x larger
    than budgeted (~512 MB at dsub=8), a Python-worker OOM risk. The
    ONE copy of the PQ encode kernel — pq_encode, pq_topk, and
    ivfpq_topk all call it."""
    import numpy as np

    m, ksub, dsub = B.shape
    out = np.empty((len(X), m), dtype=np.int32)
    step = max(1, (8 << 20) // (m * ksub * dsub))
    for s0 in range(0, len(X), step):
        xc = X[s0 : s0 + step]  # (r, m, dsub)
        out[s0 : s0 + step] = ((xc[:, :, None, :] - B[None]) ** 2).sum(-1).argmin(2)
    return out


def _pq_recon(codes, B):
    """Gather codebook centroids for int codes (n, m) -> (n, m*dsub)."""
    import numpy as np

    m, _, dsub = B.shape
    out = np.take_along_axis(B[None], codes[:, :, None, None].astype(np.int64), axis=2)
    return out[:, :, 0, :].reshape(len(codes), m * dsub)


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Encode vectors to PQ codes: per subspace, argmin distance to that
    subspace's codebook. This is a dense numeric kernel (m x k x dsub
    multiply-adds per row — 16k at the default budget), which Spark's
    higher-order functions run INTERPRETED (no codegen), so the encode
    runs as a vectorized Arrow-batched pandas UDF instead: one numpy
    broadcast per batch, codebooks broadcast once per executor
    (measured ~40x over the expression form at sf0.1). Map-only either
    way — no shuffle. Output ``array<int>`` of length m: the
    compressed index (m*nbits bits/vector at rest)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    books = np.array(codebooks, dtype=np.float64)  # (m, k, dsub)
    m, ksub, dsub = books.shape
    bc = df.sparkSession.sparkContext.broadcast(books)

    def _encode(vecs: pd.Series) -> pd.Series:
        B = bc.value
        arr = vecs.to_numpy()
        mask = np.array([v is not None for v in arr], dtype=bool)
        result = [None] * len(arr)
        if mask.any():
            # NULL embeddings encode to NULL codes instead of crashing
            # the whole batch inside np.stack
            X = (
                np.stack(arr[mask])
                .astype(np.float64)
                .reshape(int(mask.sum()), m, dsub)
            )
            for i, code in zip(np.flatnonzero(mask), _pq_codes(X, B)):
                result[i] = code
        return pd.Series(result, dtype=object)

    _encode.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    enc_udf = pandas_udf("array<int>")(_encode)
    return df.select(
        F.col(id_col), enc_udf(as_double_array(vec_col)).alias(code_col)
    )


def pq_decode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    code_col: str = "pq_code",
    out_col: str = "embedding",
) -> DataFrame:
    """Decompress stored PQ codes back to approximate vectors — the
    read path of a code-at-rest index. Arrow-batched numpy gather (a
    JVM expression over the nested codebook literal is NOT
    constant-folded inside HOF lambdas and re-evaluates m*k*dsub
    literal nodes per row — measured dominating the whole query)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    books = np.array(codebooks, dtype=np.float64)  # (m, k, dsub)
    mm, _ksub, dsub = books.shape
    bc = df.sparkSession.sparkContext.broadcast(books)

    def _decode(codes: pd.Series) -> pd.Series:
        B = bc.value
        arr = codes.to_numpy()
        mask = np.array([v is not None for v in arr], dtype=bool)
        result = [None] * len(arr)
        if mask.any():  # NULL codes decode to NULL, not a batch crash
            C = np.stack(arr[mask])  # (n, m)
            for i, rv in zip(np.flatnonzero(mask), _pq_recon(C, B)):
                result[i] = rv
        return pd.Series(result, dtype=object)

    _decode.__annotations__ = {"codes": pd.Series, "return": pd.Series}
    dec_udf = pandas_udf("array<double>")(_decode)
    return df.withColumn(out_col, dec_udf(F.col(code_col)))


def pq_topk(
    candidates: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    m: int = 8,
    nbits: int = 4,
    seed: int = 42,
    codebooks: list[list[list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    max_queries: int | None = 500_000,
) -> DataFrame:
    """Approximate top-k over the COMPRESSED index: asymmetric distance
    (query vs reconstructed candidate) — the candidate side never
    touches its original vector after encoding, only the m-byte code;
    encode + reconstruction run as ONE Arrow-batched numpy pass per
    candidate (shared _pq_codes/_pq_recon kernels), never per pair.

    Scale shape: queries broadcast (small by construction, like
    brute_force_topk); the candidate side is a map over codes + a
    per-query top-k window — same plan as brute force but scanning a
    ~64x smaller index. Recall < 1 from quantization error; raise
    m/nbits for recall, lower for compression. Deterministic; rows-only
    registry check (iterative k-means), recall pinned in pytest."""
    # guard BEFORE training (r10 review): an oversized query set must
    # raise before the sample collect + m k-means fits are paid for
    _guard_query_count(queries, max_queries, "pq_topk")
    if codebooks is None:
        codebooks = fit_pq(
            candidates, dim, m=m, nbits=nbits, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )
    # encode + reconstruct in ONE Arrow-batched numpy pass per
    # candidate, BEFORE the query join. (A JVM-expression decode of the
    # nested codebook literal is NOT constant-folded inside the HOF
    # lambda, so it re-evaluates m*k*dsub literal nodes per pair —
    # measured ~7x the whole query's cost; the numpy gather is free.)
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    books = np.array(codebooks, dtype=np.float64)  # (m, k, dsub)
    mm, ksub, dsub = books.shape
    bc = candidates.sparkSession.sparkContext.broadcast(books)

    def _recon(vecs: pd.Series) -> pd.Series:
        B = bc.value
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        X = np.stack(vecs.to_numpy()).astype(np.float64).reshape(len(vecs), mm, dsub)
        return pd.Series(list(_pq_recon(_pq_codes(X, B), B)))

    _recon.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    recon_udf = pandas_udf("array<double>")(_recon)
    # ensure_parallelism (r10 review): the Arrow encode/reconstruct pass
    # is the hot numpy kernel — a single-row-group parquet input would
    # otherwise pin it to one core (every sibling topk already wraps
    # its candidate side)
    enc = (
        _nonzero_vectors(
            ensure_parallelism(candidates).select(
                F.col(id_col).alias("neighbor_id"),
                as_double_array(vec_col).alias("_cv"),
            ),
            "_cv",
        )
        .select("neighbor_id", recon_udf(F.col("_cv")).alias("_rv"))
        .withColumn("_cn", _norm("_rv"))
    )
    q = _nonzero_vectors(
        queries.select(
            F.col(query_id_col), as_double_array(vec_col).alias("_qv")
        ),
        "_qv",
    ).withColumn("_qn", _norm("_qv"))
    scored = (
        enc.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("cosine", _pair_cosine(cv="_rv"))
    )
    # The zero-reconstruction NULL-cosine guard runs AFTER the rank, not
    # before the join: a pre-window filter(cosine IS NOT NULL) is a
    # two-sided predicate, so Catalyst inlines the whole interpreted
    # cosine aggregate into the BroadcastNestedLoopJoin CONDITION and
    # re-evaluates it per pair on top of the projection's copy (~3x the
    # query's cost at sf0.1). Post-window, cosine is a materialized
    # attribute; NULLs sort last under desc so real neighbors keep
    # identical ranks, and the trailing filter drops any NULL stragglers.
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter((F.col("rank") <= k) & F.col("cosine").isNotNull())
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def fit_ivfpq(
    candidates: DataFrame,
    dim: int,
    n_clusters: int = 16,
    m: int = 8,
    nbits: int = 6,
    seed: int = 42,
    max_iter: int = 6,
    max_train_vectors: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Train the IVF-PQ index ONCE (round-6 verdict item 4: retraining
    per query call was a fixed serial driver cost): coarse k-means on a
    bounded deterministic sample, then per-subspace PQ codebooks on the
    sample's RESIDUALS. Returns (centroids, codebooks) as plain nested
    lists — tiny (n_clusters*dim + m*2^nbits*dim/m floats), picklable,
    reusable across any number of ``ivfpq_topk(..., index=...)`` calls
    against the same corpus, matching ``fit_pq``'s factoring."""
    import numpy as np

    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub, ksub = dim // m, 1 << nbits
    c = _nonzero_vectors(
        ensure_parallelism(candidates).select(
            F.col(id_col).alias("neighbor_id"),
            as_double_array(vec_col).alias("_cv"),
        ),
        "_cv",
    )
    X = _collect_train_sample(c, "neighbor_id", "_cv", max_train_vectors, "fit_ivfpq")
    centers = _kmeans_lloyd(X, n_clusters, max_iter, seed)  # (C, dim)
    assign = _assign_nearest(X, centers)
    resid = X - centers[assign]
    books = [
        [[float(x) for x in ctr] for ctr in
         _kmeans_lloyd(resid[:, s * dsub : (s + 1) * dsub], ksub, max_iter, seed + s)]
        for s in range(m)
    ]
    return [[float(x) for x in ctr] for ctr in centers], books


def ivfpq_topk(
    candidates: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    m: int = 8,
    nbits: int = 6,
    seed: int = 42,
    max_iter: int = 6,
    max_train_vectors: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    max_queries: int | None = 500_000,
    index: tuple[list[list[float]], list[list[list[float]]]] | None = None,
) -> DataFrame:
    """IVF-PQ: the canonical billion-scale ANN index (FAISS IVFPQ) —
    IVF's coarse quantizer prunes WHICH candidates get scored
    (only ``n_probe``/``n_clusters`` of the corpus per query), PQ
    compresses WHAT is stored per candidate (RESIDUAL vectors against
    the assigned centroid, quantized to m codes). The two levers
    compose: compute drops by n_probe/n_clusters, memory by
    ~4*dim/(m*nbits/8).

    Residual encoding is the load-bearing detail: residuals
    (vector - assigned centroid) are centered near zero across every
    cluster, so ONE shared codebook set quantizes them far better than
    raw vectors at the same bit budget — the reason IVFPQ's recall
    beats flat PQ at equal code size.

    Train (driver, bounded sample): coarse k-means, then PQ codebooks
    on the sample's residuals — pass a prebuilt ``index`` from
    ``fit_ivfpq`` to skip training entirely (the production shape: an
    ANN index is built once and queried many times). Assign + encode:
    one Arrow-batched numpy pass per candidate (cluster argmin,
    residual, per-subspace argmin). Probe: queries broadcast to their
    n_probe nearest clusters; candidates reconstruct (centroid +
    decoded residual) once per row, exact cosine inside probed clusters
    only, per-query top-k window. Deterministic; rows-only registry
    check with a pytest recall floor."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub, ksub = dim // m, 1 << nbits

    _guard_query_count(queries, max_queries, "ivfpq_topk")
    c = _nonzero_vectors(
        ensure_parallelism(candidates).select(
            F.col(id_col).alias("neighbor_id"),
            as_double_array(vec_col).alias("_cv"),
        ),
        "_cv",
    )
    if index is None:
        index = fit_ivfpq(
            candidates, dim, n_clusters=n_clusters, m=m, nbits=nbits, seed=seed,
            max_iter=max_iter, max_train_vectors=max_train_vectors,
            id_col=id_col, vec_col=vec_col,
        )
    centers = np.array(index[0], dtype=np.float64)  # (C, dim)
    books = np.array(index[1], dtype=np.float64)  # (m, k, dsub)
    # derive the PQ geometry from the index ITSELF (r10 review): a
    # prebuilt index trained with a different m than this call's
    # argument would otherwise reshape residuals with the wrong
    # (m, dsub) and crash the Arrow UDF with an opaque broadcast error
    # (pq_topk already derives mm/ksub/dsub from books.shape)
    m, _ksub, dsub = (int(x) for x in books.shape)
    if m * dsub != centers.shape[1]:
        raise ValueError(
            f"IVF-PQ index geometry mismatch: codebooks imply dim "
            f"{m * dsub}, centroids have dim {centers.shape[1]}"
        )

    bc = candidates.sparkSession.sparkContext.broadcast((centers, books))
    centroids = [[float(x) for x in ctr] for ctr in centers]

    # Coarse assignment is a JVM argmin expression (codegen, like
    # ivf_topk) — NOT part of the Python UDF. The join key must never
    # be a UDF output: the inner join's isnotnull(key) constraint gets
    # pushed below the repartition exchange and drags a SECOND full
    # ArrowEvalPython pass with it (observed: the whole corpus encoded
    # twice, once serially on the scan partitioning — ~3x the query's
    # cost at sf0.1). With a JVM key the UDF evaluates exactly once,
    # after the parallelism exchange.
    cc = c.withColumn(
        "_cid",
        # never-firing coalesce(-1): the raw argmin is NULLABLE, so the
        # join's isnotnull(key) constraint would inline the whole
        # centroid-distance argmin a SECOND time into the scan filter
        # (the sampled-IVF plan audit caught this in expression form);
        # a provably non-null key folds the constraint away
        F.expr(
            "coalesce(sort_array("
            + _centroid_dists("_cv", centroids)
            + ")[0].cid, -1)"
        ),
    )

    def _recon(vecs: pd.Series, cids: pd.Series) -> pd.Series:
        C, B = bc.value
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        Xb = np.stack(vecs.to_numpy()).astype(np.float64)
        cid = cids.to_numpy(dtype=np.int64)
        R = (Xb - C[cid]).reshape(len(Xb), m, dsub)
        recon = C[cid] + _pq_recon(_pq_codes(R, B), B)
        return pd.Series(list(recon))

    _recon.__annotations__ = {"vecs": pd.Series, "cids": pd.Series, "return": pd.Series}
    recon_udf = pandas_udf("array<double>")(_recon)
    enc = cc.select(
        "neighbor_id", "_cid",
        recon_udf(F.col("_cv"), F.col("_cid")).alias("_rv"),
    ).withColumn("_cn", _norm("_rv"))
    q = (
        _nonzero_vectors(
            queries.select(
                F.col(query_id_col), as_double_array(vec_col).alias("_qv")
            ),
            "_qv",
        )
        .withColumn(
            "_cid",
            F.explode(
                F.expr(
                    "transform(slice(sort_array("
                    + _centroid_dists("_qv", centroids)
                    + f"), 1, {n_probe}), s -> s.cid)"
                )
            ),
        )
        .withColumn("_qn", _norm("_qv"))
    )
    scored = (
        enc.join(F.broadcast(q), "_cid")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("cosine", _pair_cosine(cv="_rv"))
    )
    # NULL-cosine (zero reconstruction) guard AFTER the rank — a
    # pre-window two-sided filter would inline the interpreted cosine
    # aggregate into the join condition and re-evaluate it per pair
    # (see pq_topk). NULLs sort last under desc: identical results.
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter((F.col("rank") <= k) & F.col("cosine").isNotNull())
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def fit_ivfpq_sampled(
    candidates: DataFrame,
    dim: int,
    n_clusters: int = 16,
    m: int = 16,
    nbits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Hash-sampled IVF-PQ index — ``fit_ivfpq`` with BOTH Lloyd stages
    replaced by the deterministic (md5(id), id)-order corpus sample, so
    the full IVF×PQ composition becomes value-for-value reproducible by
    an SQL twin (round-7 verdict item 5; the two axes were previously
    only checkable in isolation via ivf_sampled_topk / fit_pq_sampled):

    - coarse centroids: the first ``n_clusters`` non-zero vectors in
      hash order (exactly ``ivf_sampled_topk``'s quantizer);
    - residual codebooks: the NEXT ``2^nbits`` vectors in the same
      order — codeword ``j`` of subspace ``s`` is sample vector ``j``'s
      residual against its (rounded-cosine argmax) assigned centroid,
      sliced at subspace ``s``. The offset matters: the first
      ``n_clusters`` vectors ARE the centroids, assign to themselves
      (cosine 1.0 is the max), and would yield all-zero residual
      codebooks — a degenerate reconstruction equal to plain IVF.

    Residuals are computed where the assignment is: the sample rows are
    collected WITH their Spark-side ``_cid`` (the same literal-centroid
    argmax expression every candidate gets), and the subtraction
    ``v[i] - centroid[i]`` is one exact IEEE float64 op identical in
    driver Python, numpy, and SQL. Bounded collects only
    (n_clusters + 2^nbits rows)."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    dsub, ksub = dim // m, 1 << nbits
    c = _nonzero_vectors(
        ensure_parallelism(candidates).select(
            F.col(id_col).alias("neighbor_id"),
            as_double_array(vec_col).alias("_cv"),
        ),
        "_cv",
    )
    ctr_rows = (
        c.orderBy(F.md5(F.col("neighbor_id").cast("string")), "neighbor_id")
        .limit(n_clusters)
        .select("_cv")
        .collect()
    )
    if len(ctr_rows) < n_clusters:
        raise ValueError(
            f"fit_ivfpq_sampled: {len(ctr_rows)} non-zero vectors < "
            f"n_clusters={n_clusters}"
        )
    centroids = [[float(x) for x in r["_cv"]] for r in ctr_rows]
    ctr_norms = [_seq_norm(ctr) for ctr in centroids]
    n_c = len(centroids)
    samp_rows = (
        c.withColumn(
            "_cid",
            F.expr(
                f"{n_c - 1} - array_max("
                f"{_sampled_cos_structs_sql('`_cv`', centroids, ctr_norms)}).rc"
            ),
        )
        .orderBy(F.md5(F.col("neighbor_id").cast("string")), "neighbor_id")
        .limit(n_clusters + ksub)
        .select("_cv", "_cid")
        .collect()
    )[n_clusters:]
    if len(samp_rows) < ksub:
        raise ValueError(
            f"fit_ivfpq_sampled: {n_c + len(samp_rows)} non-zero vectors < "
            f"n_clusters + 2^nbits = {n_clusters + ksub}"
        )
    resid = [
        [float(x) - centroids[r["_cid"]][i] for i, x in enumerate(r["_cv"])]
        for r in samp_rows
    ]
    books = [
        [rv[s * dsub : (s + 1) * dsub] for rv in resid] for s in range(m)
    ]
    return centroids, books


def ivfpq_sampled_topk(
    candidates: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    m: int = 16,
    nbits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    max_queries: int | None = 500_000,
    index: tuple[list[list[float]], list[list[list[float]]]] | None = None,
) -> DataFrame:
    """IVF-PQ top-k over the hash-sampled index (``fit_ivfpq_sampled``)
    — the COMPOSITION of the two exactly-SQL-checkable primitives:
    coarse pruning assigns/probes via the shared rounded-cosine argmax
    (``_sampled_cos_structs``), compression encodes each candidate's
    RESIDUAL against its assigned centroid with the left-associative
    squared-L2 argmin (ties to the lowest code) and scores the exact
    cosine between query and (centroid + decoded residual). Every stage
    replays in SQL, so the full IVF×PQ path — not just each axis — is
    oracle-checkable; the Lloyd-trained ``ivfpq_topk`` remains the
    production recall path and shares the Arrow-batched
    ``_pq_codes``/``_pq_recon`` kernels and the plan shape (JVM join
    key, one UDF pass per candidate, broadcast query side,
    post-window NULL guard)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    _guard_query_count(queries, max_queries, "ivfpq_sampled_topk")
    if index is None:
        index = fit_ivfpq_sampled(
            candidates, dim, n_clusters=n_clusters, m=m, nbits=nbits,
            id_col=id_col, vec_col=vec_col,
        )
    centroids, books_l = index
    ctr_norms = [_seq_norm(ctr) for ctr in centroids]
    n_c = len(centroids)
    centers = np.array(centroids, dtype=np.float64)  # (C, dim)
    books = np.array(books_l, dtype=np.float64)  # (m, ksub, dsub)
    # derive m/dsub from the index itself — a prebuilt index with a
    # different m than this call's argument must not mis-reshape the
    # residuals (r10 review; same fix as ivfpq_topk)
    m, _ksub, dsub = (int(x) for x in books.shape)
    if m * dsub != centers.shape[1]:
        raise ValueError(
            f"IVF-PQ index geometry mismatch: codebooks imply dim "
            f"{m * dsub}, centroids have dim {centers.shape[1]}"
        )
    bc = candidates.sparkSession.sparkContext.broadcast((centers, books))

    c = _nonzero_vectors(
        ensure_parallelism(candidates).select(
            F.col(id_col).alias("neighbor_id"),
            as_double_array(vec_col).alias("_cv"),
        ),
        "_cv",
    )
    # JVM argmax join key with the never-firing coalesce(-1) — the
    # nullable-key double-eval and UDF-key serial-encode pathologies are
    # documented at ivf_sampled_topk / ivfpq_topk and apply unchanged
    cc = c.withColumn(
        "_cid",
        F.expr(
            f"coalesce({n_c - 1} - array_max("
            f"{_sampled_cos_structs_sql('`_cv`', centroids, ctr_norms)}).rc, -1)"
        ),
    )

    def _recon(vecs: pd.Series, cids: pd.Series) -> pd.Series:
        C, B = bc.value
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        Xb = np.stack(vecs.to_numpy()).astype(np.float64)
        cid = cids.to_numpy(dtype=np.int64)
        R = (Xb - C[cid]).reshape(len(Xb), m, dsub)
        recon = C[cid] + _pq_recon(_pq_codes(R, B), B)
        return pd.Series(list(recon))

    _recon.__annotations__ = {"vecs": pd.Series, "cids": pd.Series, "return": pd.Series}
    recon_udf = pandas_udf("array<double>")(_recon)
    enc = cc.select(
        "neighbor_id", "_cid",
        recon_udf(F.col("_cv"), F.col("_cid")).alias("_rv"),
    ).withColumn("_cn", _norm("_rv"))
    q = (
        _nonzero_vectors(
            queries.select(
                F.col(query_id_col), as_double_array(vec_col).alias("_qv")
            ),
            "_qv",
        )
        .withColumn(
            "_cid",
            F.explode(
                F.expr(
                    "transform(slice(reverse(sort_array("
                    f"{_sampled_cos_structs_sql('`_qv`', centroids, ctr_norms)}"
                    f")), 1, {n_probe}), s -> {n_c - 1} - s.rc)"
                )
            ),
        )
        .withColumn("_qn", _norm("_qv"))
    )
    scored = (
        enc.join(F.broadcast(q), "_cid")
        .filter(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("cosine", _pair_cosine(cv="_rv"))
    )
    # post-window NULL guard: see pq_topk
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter((F.col("rank") <= k) & F.col("cosine").isNotNull())
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )
