"""IVF ANN quality: the approximate index must recover most of the
exact brute-force neighbors (no SQL oracle exists for iterative
KMeans, so recall vs the exact baseline is the correctness check)."""

from __future__ import annotations

from turbine_maintenance_etl_spark.llm import similarity as S

SF = "/root/testdata/sf0.001"


def test_ivf_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    from pyspark.sql import functions as F

    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ivf_topk(emb, queries, k=5, n_clusters=8, n_probe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall@5 {recall:.2f} below floor"
    # every approx hit must carry the same cosine the exact path computed
    # (scores are exact inside probed clusters; only coverage is approximate)
    exact_scores = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in S.brute_force_topk(emb, queries, k=50).collect()
    }
    for r in S.ivf_topk(emb, queries, k=5, n_clusters=8, n_probe=3).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert abs(exact_scores[key] - r["cosine"]) < 1e-9


def test_ivf_sampled_recall_and_exact_scores(spark):
    """The hash-sampled-quantizer IVF (no Lloyd refinement) must still
    recover a usable share of exact neighbors, and — like every IVF
    path — scores inside probed clusters are EXACT."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    from pyspark.sql import functions as F

    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ivf_sampled_topk(
            emb, queries, k=5, n_clusters=8, n_probe=3
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"sampled-IVF recall@5 {recall:.2f} below floor"
    exact_scores = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in S.brute_force_topk(emb, queries, k=50).collect()
    }
    for r in S.ivf_sampled_topk(
        emb, queries, k=5, n_clusters=8, n_probe=3
    ).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert abs(exact_scores[key] - r["cosine"]) < 1e-9


def test_ivf_sampled_deterministic_and_probe_monotone(spark):
    """Two invocations agree exactly (no RNG anywhere in the path), and
    raising n_probe can only widen coverage — the probed-cluster set is
    a prefix of the same centroid ranking."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    from pyspark.sql import functions as F

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, S.ivf_sampled_topk(emb, queries, k=3).collect()))
    b = sorted(map(tuple, S.ivf_sampled_topk(emb, queries, k=3).collect()))
    assert a == b
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }

    def recall(n_probe):
        hits = {
            (r["query_id"], r["neighbor_id"])
            for r in S.ivf_sampled_topk(
                emb, queries, k=5, n_clusters=8, n_probe=n_probe
            ).collect()
        }
        return len(exact & hits) / len(exact)

    assert recall(8) >= recall(2)  # probing every cluster == exact coverage


def test_ivf_deterministic(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    from pyspark.sql import functions as F

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, S.ivf_topk(emb, queries, k=3).collect()))
    b = sorted(map(tuple, S.ivf_topk(emb, queries, k=3).collect()))
    assert a == b


def test_resolve_duplicate_clusters_matches_union_find(spark):
    """Label propagation == classic union-find on random graphs,
    including chains (worst-case diameter) and singleton pairs."""
    import random

    from turbine_maintenance_etl_spark.llm.dedup import resolve_duplicate_clusters

    rng = random.Random(17)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(45)]
    edges += [(100 + i, 101 + i) for i in range(12)]  # a 13-node chain
    edges = [(a, b) for a, b in edges if a != b]

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    expected = {x: find(x) for x in parent}
    # canonical: min member of each component
    comp_min = {}
    for x, r in expected.items():
        comp_min.setdefault(find(r), set()).add(x)
    want = {x: min(m) for r, m in comp_min.items() for x in m}

    pairs = spark.createDataFrame(edges, "id_a int, id_b int")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in resolve_duplicate_clusters(pairs, max_iter=30).collect()
    }
    assert got == want


def test_lsh_to_clusters_end_to_end(spark):
    """minhash pairs -> clusters -> survivors: survivors are unique per
    cluster and every clustered doc maps to a surviving min id."""
    from pyspark.sql import functions as F

    from turbine_maintenance_etl_spark.llm import dedup as D

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = D.minhash_lsh_candidates(docs)
    clusters = D.resolve_duplicate_clusters(pairs)
    assert clusters.filter(F.col("cluster_id") > F.col("doc_id")).count() == 0
    per = clusters.groupBy("cluster_id").agg(F.min("doc_id").alias("m"))
    assert per.filter(F.col("m") != F.col("cluster_id")).count() == 0


def test_minhash_slots_are_independent_permutations(spark):
    """Round-1 regression (ADVICE high): the affine permutations never
    wrapped their modulus, so all K signature slots were determined by
    the single minimum shingle hash — two docs matched on ALL slots or
    (generically) none, collapsing banded LSH to one equality test.

    With a genuine universal hash family the per-slot match indicator is
    ~Bernoulli(J): for a pair with shingle Jaccard J strictly between 0
    and 1, the number of matching slots out of K=32 must be strictly
    between 0 and 32 and near J*32."""
    from turbine_maintenance_etl_spark.llm.dedup import minhash_signatures

    words_a = [f"w{i}" for i in range(100)]
    words_b = words_a[:70] + [f"x{i}" for i in range(30)]  # heavy overlap
    docs = spark.createDataFrame(
        [(1, " ".join(words_a)), (2, " ".join(words_b))], "doc_id int, text string"
    )
    sigs = {
        r["doc_id"]: r["signature"]
        for r in minhash_signatures(docs, num_hashes=32).collect()
    }
    matches = sum(a == b for a, b in zip(sigs[1], sigs[2]))

    # true trigram-shingle Jaccard of the two docs
    def sh(ws):
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    j = len(sh(words_a) & sh(words_b)) / len(sh(words_a) | sh(words_b))
    assert 0 < j < 1
    assert 0 < matches < 32, f"degenerate all-or-nothing signature: {matches}/32"
    # K=32 => sigma ~ sqrt(J(1-J)/32) ~ 0.09; allow ~3 sigma
    assert abs(matches / 32 - j) < 0.3, f"match rate {matches/32:.2f} vs J={j:.2f}"

    # and the slots within one signature must not be a monotone map of a
    # single argmin (the degenerate case made rank order identical for
    # every doc): many distinct values, not one repeated value
    assert len(set(sigs[1])) > 16


def test_lsh_bucket_cap_and_stats(spark):
    """An adversarial boilerplate corpus (many identical docs) forms a
    mega-bucket: the default cap drops it from pair expansion, and the
    stats operator reports exactly what was capped — no silent caps."""
    from pyspark.sql import functions as F

    from turbine_maintenance_etl_spark.llm.dedup import (
        minhash_lsh_bucket_stats,
        minhash_lsh_candidates,
    )

    boiler = "lorem ipsum dolor sit amet " * 10
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(40)]
        + [(100, "a unique document about turbines and rotors spinning fast"),
           (101, "another unique text concerning maintenance schedules today")],
        "doc_id int, text string",
    )
    # cap smaller than the boilerplate cluster: its buckets are dropped
    pairs = minhash_lsh_candidates(docs, max_bucket_size=10)
    got = pairs.collect()
    ids = {r["id_a"] for r in got} | {r["id_b"] for r in got}
    assert not (ids & set(range(40))), "capped bucket leaked pairs"

    stats = minhash_lsh_bucket_stats(docs, max_bucket_size=10).collect()
    assert all(r["n_capped_buckets"] >= 1 for r in stats)
    assert all(r["n_docs_in_capped"] == 40 for r in stats)
    assert all(r["max_bucket_size"] == 40 for r in stats)

    # with the cap lifted, the boilerplate cluster pairs up fully
    pairs_uncapped = minhash_lsh_candidates(docs, max_bucket_size=None)
    assert pairs_uncapped.count() >= 40 * 39 // 2


def test_lsh_recall_floor_survives_mega_bucket_cap(spark):
    """Adversarial skew: a boilerplate cluster big enough to trip the
    mega-bucket cap must NOT drag down candidate recall for the genuine
    near-duplicate pairs elsewhere in the corpus.

    Construction (seeded, deterministic): 25 near-dup pairs with
    disjoint vocabularies (tail-block edits keep trigram Jaccard ~0.75,
    above the 8x4 banding threshold ~0.6), plus 60 identical
    boilerplate docs that form a capped mega-bucket. Ground truth =
    brute-force n-gram Jaccard >= 0.6 restricted to the non-boilerplate
    docs; recall of LSH candidates over that truth must hold >= 0.8
    WHILE the stats operator reports the cap engaged — the accounting
    makes the floor assertable."""
    import random

    from pyspark.sql import functions as F

    from turbine_maintenance_etl_spark.llm.dedup import (
        minhash_lsh_bucket_stats,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    rng = random.Random(7)
    rows = []
    for p in range(25):
        base = [f"p{p}w{rng.randrange(10_000)}" for _ in range(60)]
        variant = base[:-6] + [f"p{p}v{rng.randrange(10_000)}" for _ in range(6)]
        rows.append((2 * p, " ".join(base)))
        rows.append((2 * p + 1, " ".join(variant)))
    boiler = "standard legal disclaimer boilerplate text repeated verbatim " * 5
    rows += [(1000 + i, boiler) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")

    cap = 50  # below the 60-doc boilerplate cluster
    stats = minhash_lsh_bucket_stats(docs, max_bucket_size=cap).collect()
    assert all(r["n_capped_buckets"] >= 1 for r in stats), "cap never engaged"
    assert all(r["n_docs_in_capped"] == 60 for r in stats)

    truth_df = ngram_jaccard_pairs(
        docs.filter(F.col("doc_id") < 1000), threshold=0.6, max_rows=None
    )
    truth = {(r["id_a"], r["id_b"]) for r in truth_df.collect()}
    assert len(truth) >= 20  # the construction really makes near-dups

    cands = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(docs, max_bucket_size=cap).collect()
    }
    recall = len(truth & cands) / len(truth)
    assert recall >= 0.8, f"recall {recall:.2f} under mega-bucket cap"


def test_quadratic_kernels_guarded(spark):
    """The O(n^2) operators refuse full-scale inputs unless forced."""
    import pytest
    from pyspark.sql import functions as F

    from turbine_maintenance_etl_spark.llm.dedup import ngram_jaccard_pairs
    from turbine_maintenance_etl_spark.llm.similarity import brute_force_topk

    docs = spark.range(50).select(
        F.col("id").alias("doc_id"), F.lit("some text here").alias("text")
    )
    with pytest.raises(ValueError, match="quadratic"):
        ngram_jaccard_pairs(docs, max_rows=10)
    emb = spark.range(30).select(
        F.col("id").alias("vec_id"), F.array(F.lit(1.0), F.lit(2.0)).alias("embedding")
    )
    q = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    with pytest.raises(ValueError, match="broadcast"):
        brute_force_topk(emb, q, max_queries=10)
    # forcing works
    assert brute_force_topk(emb, q.limit(3), max_queries=None).count() > 0

    from turbine_maintenance_etl_spark.llm.dedup import containment_scores

    pairs = docs.crossJoin(
        docs.select(F.col("doc_id").alias("id_b"))
    ).select(F.col("doc_id").alias("id_a"), "id_b")
    with pytest.raises(ValueError, match="verification kernel"):
        containment_scores(docs, pairs, max_pairs=100)


def test_cluster_resolution_long_chain(spark):
    """A 30-node chain (diameter 29) must fully collapse to cluster 1 —
    plain min-label propagation capped at 10 rounds would silently
    return wrong clusters here; pointer jumping converges in O(log d)."""
    from turbine_maintenance_etl_spark.llm.dedup import resolve_duplicate_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 30)], "id_a int, id_b int"
    )
    got = resolve_duplicate_clusters(chain, max_iter=10)
    rows = got.collect()
    assert len(rows) == 30
    assert all(r["cluster_id"] == 1 for r in rows), sorted(
        (r["doc_id"], r["cluster_id"]) for r in rows
    )[:5]


def test_incremental_lsh_matches_full_corpus_restriction(spark):
    """incremental_lsh_candidates(new, index(existing)) == the
    full-corpus LSH pair set restricted to new<->existing pairs
    (orientation-normalized): indexing once and probing per batch loses
    no candidates vs re-running LSH over everything."""
    from pyspark.sql import functions as F

    from turbine_maintenance_etl_spark.llm import dedup as D

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    existing = docs.filter(F.col("doc_id") % 4 != 0)
    new_batch = docs.filter(F.col("doc_id") % 4 == 0)

    index = D.lsh_band_buckets(existing)
    got = {
        (r["new_id"], r["existing_id"])
        for r in D.incremental_lsh_candidates(new_batch, index).collect()
    }

    full = D.minhash_lsh_candidates(docs, max_bucket_size=None).collect()
    want = set()
    for r in full:
        a, b = r["id_a"], r["id_b"]
        if a % 4 == 0 and b % 4 != 0:
            want.add((a, b))
        elif b % 4 == 0 and a % 4 != 0:
            want.add((b, a))
    assert got == want and len(want) > 0


def test_incremental_lsh_index_bucket_cap(spark):
    """Mega-buckets in the stored index are excluded by max_bucket_size
    (boilerplate guard), and probing an appended index
    (index UNION new rows) equals batch-self + batch-vs-corpus pairs."""
    from pyspark.sql import functions as F

    from turbine_maintenance_etl_spark.llm import dedup as D

    boiler = [(i, "lorem ipsum dolor sit amet consectetur") for i in range(1, 30)]
    uniq = [(100 + i, f"unique document number {i} about topic {i * 7}") for i in range(5)]
    docs = spark.createDataFrame(boiler + uniq, "doc_id long, text string")
    new_batch = spark.createDataFrame(
        [(1000, "lorem ipsum dolor sit amet consectetur")], "doc_id long, text string"
    )
    index = D.lsh_band_buckets(docs)
    capped = D.incremental_lsh_candidates(new_batch, index, max_bucket_size=10)
    assert capped.count() == 0  # the 29-doc boilerplate bucket is capped
    uncapped = D.incremental_lsh_candidates(new_batch, index, max_bucket_size=None)
    assert uncapped.count() == 29  # matches every boilerplate doc

    # match_all: the saturated bucket is the match — one (new_id, NULL)
    # row, so a continuous-ingest loop still DROPS the 30th template
    # copy instead of admitting one per batch forever
    hits = D.incremental_lsh_candidates(
        new_batch, index, max_bucket_size=10, saturated_policy="match_all"
    ).collect()
    assert {(r["new_id"], r["existing_id"]) for r in hits} == {(1000, None)}


def test_minhash_lsh_saturated_representative_policy(spark):
    """Over-cap buckets under saturated_policy='representative' pair
    every member with the bucket's min-id rep (LINEAR), so candidate-
    level dedup still collapses a near-dup mega-cluster that exact
    dedup cannot absorb; the default 'skip' emits nothing for them."""
    from turbine_maintenance_etl_spark.llm import dedup as D

    # 6 near-identical docs (identical text → identical signature)
    docs = spark.createDataFrame(
        [(i, "lorem ipsum dolor sit amet consectetur adipiscing") for i in range(6)],
        "doc_id long, text string",
    )
    skip = D.minhash_lsh_candidates(docs, max_bucket_size=3)
    assert skip.count() == 0  # bucket of 6 > cap: dropped under default
    rep = D.minhash_lsh_candidates(
        docs, max_bucket_size=3, saturated_policy="representative"
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in rep} == {(0, i) for i in range(1, 6)}
    # survivorship convention (drop id_b) keeps exactly the min id
    import pytest

    with pytest.raises(ValueError, match="saturated_policy"):
        D.minhash_lsh_candidates(docs, saturated_policy="nope")


def test_semantic_dedup_crafted_clusters(spark):
    """Three near-identical vectors (same direction, tiny jitter) plus
    orthogonal singletons: the trio collapses to one survivor (min id),
    singletons survive as their own clusters."""
    from turbine_maintenance_etl_spark.llm.similarity import semantic_dedup

    dim = 8
    base = [1.0, 0.5, -0.3, 0.8, 0.1, -0.6, 0.4, 0.2]
    jig = lambda eps: [v + eps for v in base]  # noqa: E731
    rows = [
        (1, jig(0.0)), (2, jig(0.01)), (3, jig(0.02)),  # near-dup trio
        (10, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
        (11, [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r.asDict() for r in semantic_dedup(emb, dim=dim, threshold=0.95).collect()}
    assert out[1]["survivor"] and out[1]["cluster_id"] == 1
    assert not out[2]["survivor"] and out[2]["cluster_id"] == 1
    assert not out[3]["survivor"] and out[3]["cluster_id"] == 1
    assert out[10]["survivor"] and out[10]["cluster_id"] == 10
    assert out[11]["survivor"] and out[11]["cluster_id"] == 11


def test_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe (own bucket + all Hamming-1 neighbors) must recover
    at least every pair single-probe finds, and strictly improve recall
    vs the brute-force ground truth on this corpus."""
    from pyspark.sql import functions as F

    from turbine_maintenance_etl_spark.llm.similarity import (
        brute_force_topk,
        lsh_bucketed_topk,
        lsh_multiprobe_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 25).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_bucketed_topk(emb, q, dim=64, k=5).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_multiprobe_topk(emb, q, dim=64, k=5).collect()
    }
    recall_single = len(single & truth) / len(truth)
    recall_multi = len(multi & truth) / len(truth)
    # multi-probe must dominate, and on this corpus it does so by a wide
    # margin: neighbors here sit at cosine ~0.4 (angle ~66°), so each
    # sign bit flips w.p. ~0.37 and P(hamming<=1) ~ 4x P(hamming=0) —
    # multi-probe's whole point. (Deterministic: seeded planes + data.)
    assert recall_multi >= recall_single
    assert recall_multi >= 2 * recall_single
    assert recall_multi > 0.2


def test_containment_detects_excerpt_asymmetry(spark):
    """A short excerpt inside a long document: containment of the
    excerpt in the host is 1.0 while the reverse (and Jaccard) is low —
    the asymmetric signal symmetric near-dup thresholds miss."""
    from turbine_maintenance_etl_spark.llm.dedup import containment_scores

    host_words = [f"w{i}" for i in range(60)]
    excerpt_words = host_words[20:30]  # strict contiguous subset
    docs = spark.createDataFrame(
        [(1, " ".join(excerpt_words)), (2, " ".join(host_words))],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = containment_scores(docs, pairs).collect()[0]
    # excerpt has 8 trigram shingles, all present in the host's 58
    assert r["c_a_in_b"] == 1.0
    assert r["c_b_in_a"] == round(8 / 58, 4)
    assert r["jaccard"] == round(8 / 58, 4)


def test_semantic_dedup_bucket_cap_and_autosizing(spark):
    """The mega-bucket cap drops saturated buckets (same doctrine as
    LSH: mass exact duplication belongs to exact-dedup), and capped
    docs still survive as their own clusters."""
    from turbine_maintenance_etl_spark.llm.similarity import semantic_dedup

    base = [1.0, 0.5, -0.3, 0.8, 0.1, -0.6, 0.4, 0.2]
    clones = [(i, list(base)) for i in range(30)]          # one mega-bucket
    solo = [(100, [0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0])]
    emb = spark.createDataFrame(clones + solo, "vec_id long, embedding array<double>")

    capped = semantic_dedup(emb, dim=8, num_planes=4, max_bucket_size=10)
    rows = {r["vec_id"]: r.asDict() for r in capped.collect()}
    assert len(rows) == 31                       # every vector still present
    assert all(r["survivor"] for r in rows.values())  # no pairs -> all survive

    uncapped = semantic_dedup(emb, dim=8, num_planes=4, threshold=0.99)
    surv = uncapped.filter("survivor").count()
    assert surv == 2  # 30 clones collapse to one survivor + the solo


def test_auto_num_planes_formula():
    """The auto-sizing formula must GROW the bucket space with N — a
    regression here silently reintroduces the measured 20x N^2/buckets
    blowup (PLANS.md round-3 scale probe)."""
    from turbine_maintenance_etl_spark.llm.similarity import auto_num_planes

    assert auto_num_planes(500) == 4          # floor
    assert auto_num_planes(2000) == 4         # 2000/500=4 -> log2=2 -> floor 4
    assert auto_num_planes(16_000) == 5       # 32 buckets
    assert auto_num_planes(1_000_000) == 11   # 2048 buckets
    assert auto_num_planes(100_000_000) == 18
    # monotone non-decreasing in N
    vals = [auto_num_planes(n) for n in (1, 10**3, 10**5, 10**7, 10**9)]
    assert vals == sorted(vals)


def test_duplicated_span_stats_hand_computed(spark):
    """Exact substring-span dedup on a crafted corpus: doc 1 and doc 2
    share one 10-token boilerplate block (docs differ elsewhere), doc 3
    repeats its own 8-token span, doc 4 is unique, doc 5 is too short to
    hold any 8-gram."""
    from turbine_maintenance_etl_spark.llm.dedup import duplicated_span_stats

    boiler = "the quick brown fox jumps over the lazy dog again"  # 10 tokens
    rows = [
        (1, boiler + " alpha beta gamma"),
        (2, "intro words here " + boiler),
        (3, "one two three four five six seven eight one two three four five six seven eight"),
        (4, "totally unique content with no repeated spans anywhere in this corpus at all"),
        (5, "way too short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in duplicated_span_stats(df, n=8).collect()}

    # docs 1+2: the shared 10-token block holds three 8-gram positions
    # each; all 10 boilerplate tokens are covered, nothing else.
    for d, n_tok in ((1, 13), (2, 13)):
        assert got[d]["n_tokens"] == n_tok
        assert got[d]["n_dup_spans"] == 3
        assert got[d]["n_dup_tokens"] == 10
        assert abs(got[d]["dup_frac"] - 10 / 13) < 1e-6
    # doc 3: 16 tokens = the same 8-token phrase twice; positions 1 and 9
    # hold identical 8-grams (plus the wrap-around grams are unique), so
    # 2 dup spans covering all 16 tokens.
    assert got[3]["n_dup_spans"] == 2
    assert got[3]["n_dup_tokens"] == 16
    assert got[3]["dup_frac"] == 1.0
    # unique and too-short docs: zero coverage, still present in output.
    for d in (4, 5):
        assert got[d]["n_dup_spans"] == 0
        assert got[d]["n_dup_tokens"] == 0
        assert got[d]["dup_frac"] == 0.0


def test_remove_duplicated_spans_hand_computed(spark):
    """Rewrite semantics on a crafted corpus: canonical (min doc_id,pos)
    occurrence survives, every other occurrence's tokens are dropped,
    fully-copied docs empty out, untouched/short docs pass through."""
    from turbine_maintenance_etl_spark.llm.dedup import remove_duplicated_spans

    boiler = "the quick brown fox jumps over the lazy dog again"  # 10 tokens
    phrase = "one two three four five six seven eight"  # 8 tokens
    rows = [
        (1, boiler + " alpha beta gamma"),
        (2, "intro words here " + boiler),
        (3, phrase + " " + phrase),
        (4, "totally unique content with no repeated spans anywhere in this corpus at all"),
        (5, "way too short"),
        (6, phrase),  # exact copy of a span canonical elsewhere -> fully removed
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in remove_duplicated_spans(df, n=8).collect()}

    # doc 1 holds every shared gram's canonical occurrence -> untouched
    assert got[1]["n_removed_tokens"] == 0
    assert got[1]["cleaned_text"] == boiler + " alpha beta gamma"
    # doc 2's copy of the block (token idx 4..13) is non-canonical
    assert got[2]["n_removed_tokens"] == 10
    assert got[2]["cleaned_text"] == "intro words here"
    # doc 3: second occurrence of the phrase (idx 9..16) removed
    assert got[3]["n_removed_tokens"] == 8
    assert got[3]["cleaned_text"] == phrase
    # unique + short docs: pass-through (tokenizer-rejoined)
    assert got[4]["n_removed_tokens"] == 0 and got[4]["cleaned_text"].startswith("totally unique")
    assert got[5] == {
        "doc_id": 5, "n_tokens": 3, "n_removed_tokens": 0,
        "cleaned_text": "way too short",
    }
    # doc 6 is one big non-canonical span -> empties out entirely
    assert got[6] == {
        "doc_id": 6, "n_tokens": 8, "n_removed_tokens": 8, "cleaned_text": "",
    }


def test_remove_duplicated_spans_consistent_with_stats(spark):
    """On real data the rewrite must drop a subset of what the stats
    operator reports as covered: removed <= n_dup_tokens per doc, with
    equality exactly when the doc holds no canonical occurrence."""
    from turbine_maintenance_etl_spark.llm.dedup import (
        duplicated_span_stats,
        remove_duplicated_spans,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = {r["doc_id"]: r.asDict() for r in duplicated_span_stats(docs, n=8).collect()}
    rewrite = {r["doc_id"]: r.asDict() for r in remove_duplicated_spans(docs, n=8).collect()}
    assert set(stats) == set(rewrite)
    some_dup = 0
    for d, s in stats.items():
        r = rewrite[d]
        assert r["n_tokens"] == s["n_tokens"]
        assert r["n_removed_tokens"] <= s["n_dup_tokens"], d
        kept_tokens = len(r["cleaned_text"].split()) if r["cleaned_text"] else 0
        assert kept_tokens == r["n_tokens"] - r["n_removed_tokens"], d
        some_dup += int(r["n_removed_tokens"] > 0)
    assert some_dup > 0  # the corpus actually exercises removal


def test_pq_encode_codes_bounded_and_deterministic(spark):
    from turbine_maintenance_etl_spark.llm.similarity import fit_pq, pq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = fit_pq(emb, dim=64, m=16, nbits=8)
    books2 = fit_pq(emb, dim=64, m=16, nbits=8)
    assert books == books2  # seeded trainer reproduces
    codes = pq_encode(emb, books).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r["pq_code"]) == 16
        assert all(0 <= c < 256 for c in r["pq_code"])


def test_pq_topk_recall_floor_vs_brute_force(spark):
    """Asymmetric-distance top-k over the compressed index keeps recall
    above a floor at the default code budget (16 B/vector vs 256 B
    fp32 — the 16x index cut is the point; measured 0.76 here)."""
    from pyspark.sql import functions as F

    from turbine_maintenance_etl_spark.llm.similarity import (
        brute_force_topk,
        pq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    pq = {
        (r["query_id"], r["neighbor_id"])
        for r in pq_topk(emb, queries, dim=64, k=5, m=16, nbits=8).collect()
    }
    assert len(pq & bf) / len(bf) >= 0.6


def test_pq_sampled_recall_floor_and_determinism(spark):
    """Hash-sampled codebooks (no Lloyd) trade recall for exact
    SQL-checkability; the floor pins they still retrieve a usable
    share, and two invocations agree exactly (no RNG in the path)."""
    from pyspark.sql import functions as F

    from turbine_maintenance_etl_spark.llm.similarity import (
        brute_force_topk,
        fit_pq_sampled,
        pq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    books = fit_pq_sampled(emb, dim=64, m=16, nbits=4)
    out = pq_topk(emb, queries, dim=64, k=5, m=16, nbits=4, codebooks=books)
    pq = {(r["query_id"], r["neighbor_id"]) for r in out.collect()}
    assert len(pq & bf) / len(bf) >= 0.25
    again = pq_topk(emb, queries, dim=64, k=5, m=16, nbits=4, codebooks=books)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_pq_decode_matches_codebook_lookup(spark):
    """pq_decode(pq_encode(x)) reconstructs exactly the argmin centroid
    per subspace (the quantized vector), verified against numpy."""
    import numpy as np

    from turbine_maintenance_etl_spark.llm.similarity import (
        fit_pq,
        pq_decode,
        pq_encode,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = fit_pq(emb, dim=64, m=16, nbits=8)
    got = {
        r["vec_id"]: np.array(r["embedding"])
        for r in pq_decode(pq_encode(emb, books), books).limit(50).collect()
    }
    B = np.array(books)
    src = {r["vec_id"]: np.array(r["embedding"]) for r in emb.limit(500).collect()}
    checked = 0
    for vid, rec in got.items():
        if vid not in src:
            continue
        x = src[vid].reshape(16, 4)
        codes = ((x[:, None, :] - B) ** 2).sum(-1).argmin(1)
        want = B[np.arange(16), codes].reshape(64)
        assert np.allclose(rec, want, atol=1e-9), vid
        checked += 1
    assert checked > 10


def test_ivfpq_recall_floor_and_determinism(spark):
    """IVF-PQ (coarse pruning + residual codes): recall floor at the
    default probe budget, and repeat runs reproduce exactly (seeded
    trainers, deterministic sample)."""
    from pyspark.sql import functions as F

    from turbine_maintenance_etl_spark.llm.similarity import (
        brute_force_topk,
        ivfpq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    run = lambda: sorted(  # noqa: E731
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivfpq_topk(
            emb, queries, dim=64, k=5, n_clusters=16, n_probe=8, m=16, nbits=6
        ).collect()
    )
    r1 = run()
    assert r1 == run()  # deterministic end to end
    got = {(q, n) for q, n, _ in r1}
    assert len(got & bf) / len(bf) >= 0.45  # measured 0.59; pruning-bounded


# --- hypothesis differential: span REWRITE vs brute-force reference -------


def _brute_span_dedup(texts: dict[int, str], n: int, min_count: int = 2) -> dict:
    """Direct transcription of the ExactSubstr rewrite semantics:
    duplicated = span content occurring >= min_count corpus-wide;
    canonical = smallest (doc_id, pos); token dropped iff covered by a
    marked (non-canonical) occurrence AND NOT covered by any canonical
    occurrence (canonical protection — one COMPLETE surviving copy per
    span content, even when occurrences overlap). Unaffected docs pass
    through with their original text."""
    from collections import defaultdict

    toks = {d: t.split() for d, t in texts.items()}
    occs = defaultdict(list)
    for d in sorted(toks):
        tk = toks[d]
        for i in range(len(tk) - n + 1):
            occs[tuple(tk[i : i + n])].append((d, i))
    marked_cov = defaultdict(set)
    canon_cov = defaultdict(set)
    for g, occ in occs.items():
        if len(occ) >= min_count:
            occ_sorted = sorted(occ)
            d0, i0 = occ_sorted[0]
            canon_cov[d0].update(range(i0, i0 + n))
            for d, i in occ_sorted[1:]:
                marked_cov[d].update(range(i, i + n))
    out = {}
    for d, tk in toks.items():
        removed = marked_cov[d] - canon_cov[d]
        if not removed:
            out[d] = (len(tk), 0, texts[d])
            continue
        kept = [w for idx, w in enumerate(tk) if idx not in removed]
        out[d] = (len(tk), len(tk) - len(kept), " ".join(kept))
    return out


def test_span_rewrite_hypothesis_differential(spark):
    """Property test (round-4 verdict stretch #7): remove_duplicated_spans
    == the brute-force Python reference on randomized tiny corpora over a
    3-word alphabet — which densely generates overlapping spans, repeats
    WITHIN one document, and cross-document canonical races. One Spark
    job evaluates all generated corpora (hypothesis drives the data,
    Spark runs batched) to keep runtime sane."""
    from hypothesis import given, settings, strategies as st

    from turbine_maintenance_etl_spark.llm.dedup import remove_duplicated_spans

    word = st.sampled_from(["a", "b", "c"])
    doc = st.lists(word, min_size=0, max_size=12).map(" ".join)
    corpus = st.lists(doc, min_size=1, max_size=5)

    @settings(max_examples=25, deadline=None)
    @given(corpus=corpus)
    def check(corpus):
        texts = {i: t for i, t in enumerate(corpus)}
        df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_removed_tokens"], r["cleaned_text"])
            for r in remove_duplicated_spans(df, n=3).collect()
        }
        assert got == _brute_span_dedup(texts, n=3)

    check()


def test_cluster_aware_split_no_leakage(spark):
    from pyspark.sql import functions as F

    """The whole point: no LSH near-dup pair may straddle train/eval;
    membership is deterministic; unclustered docs self-represent."""
    from turbine_maintenance_etl_spark.llm.dedup import (
        cluster_aware_split,
        minhash_lsh_candidates,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = cluster_aware_split(docs)
    assert out.count() == docs.count()
    # every candidate pair lands on the same side
    pairs = minhash_lsh_candidates(docs)
    sides = out.select("doc_id", "split")
    straddle = (
        pairs.join(sides.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("split", "split_a")
        .join(sides.withColumnRenamed("doc_id", "id_b"), "id_b")
        .filter(F.col("split_a") != F.col("split"))
    )
    assert straddle.count() == 0
    # deterministic: a second run assigns identical splits
    again = cluster_aware_split(docs).select("doc_id", "split")
    assert (
        out.select("doc_id", "split")
        .exceptAll(again)
        .count()
        == 0
    )


def test_cluster_aware_split_stable_under_unrelated_appends(spark):
    """The SCALING.md claim: appending documents that share no shingles
    with the existing corpus (no new near-dup edges) leaves every
    existing split assignment unchanged — membership is a pure function
    of the cluster representative, and unrelated growth cannot move it."""
    from pyspark.sql import functions as F

    from turbine_maintenance_etl_spark.llm.dedup import cluster_aware_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    before = {
        r["doc_id"]: (r["rep_id"], r["split"])
        for r in cluster_aware_split(docs).select("doc_id", "rep_id", "split").collect()
    }
    # disjoint vocabulary -> zero shared 3-shingles with the corpus
    new = (
        docs.limit(20)
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
        .withColumn(
            "text",
            F.array_join(
                F.expr(
                    "transform(sequence(1, 40), "
                    "j -> concat('zzqw', doc_id, 'tok', j))"
                ),
                " ",
            ),
        )
    )
    grown = docs.unionByName(new.select(*docs.columns))
    after = {
        r["doc_id"]: (r["rep_id"], r["split"])
        for r in cluster_aware_split(grown).select("doc_id", "rep_id", "split").collect()
    }
    assert {k: v for k, v in after.items() if k < 10_000_000} == before


def test_cluster_aware_split_custom_id_col(spark):
    """The id_col knob must actually work: same assignments as the
    default path modulo the renamed column."""
    from turbine_maintenance_etl_spark.llm.dedup import cluster_aware_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    renamed = docs.withColumnRenamed("doc_id", "id")
    got = {
        r["id"]: (r["rep_id"], r["split"])
        for r in cluster_aware_split(renamed, id_col="id")
        .select("id", "rep_id", "split")
        .collect()
    }
    want = {
        r["doc_id"]: (r["rep_id"], r["split"])
        for r in cluster_aware_split(docs).select("doc_id", "rep_id", "split").collect()
    }
    assert got == want


def test_similarity_tolerates_null_and_zero_vectors(spark):
    """NULL embeddings and zero vectors must neither crash the numpy
    kernels nor surface as rank-k 'neighbors' with NULL cosine, across
    every top-k path; pq_encode emits NULL codes for NULL vectors."""
    from turbine_maintenance_etl_spark.llm import similarity as S

    good = [(i, [float(i % 7 + 1), float((i * 3) % 5 + 1), 1.0, 0.5]) for i in range(40)]
    bad = [(100, None), (101, [0.0, 0.0, 0.0, 0.0])]
    cand = spark.createDataFrame(good + bad, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(0, [1.0, 1.0, 1.0, 0.5]), (200, None), (201, [0.0] * 4)],
        "query_id long, embedding array<double>",
    )
    for fn, kw in (
        (S.brute_force_topk, {}),
        (S.lsh_bucketed_topk, {"dim": 4, "num_planes": 2}),
        (S.lsh_multiprobe_topk, {"dim": 4, "num_planes": 2}),
        (S.ivf_topk, {"n_clusters": 2, "n_probe": 2}),
        (S.ivf_sampled_topk, {"n_clusters": 2, "n_probe": 2}),
        (S.pq_topk, {"dim": 4, "m": 2, "nbits": 2}),
        (S.ivfpq_topk, {"dim": 4, "n_clusters": 2, "n_probe": 2, "m": 2, "nbits": 2}),
    ):
        rows = fn(cand, queries, k=3, **kw).collect()
        assert rows, fn.__name__
        assert all(r["cosine"] is not None for r in rows), fn.__name__
        ids = {r["neighbor_id"] for r in rows}
        assert 100 not in ids and 101 not in ids, fn.__name__
    books = S.fit_pq_sampled(cand, dim=4, m=2, nbits=2)
    rows = S.pq_topk(cand, queries, dim=4, k=3, m=2, nbits=2, codebooks=books).collect()
    assert rows and all(r["cosine"] is not None for r in rows)

    codes = {
        r["vec_id"]: r["pq_code"]
        for r in S.pq_encode(
            cand, S.fit_pq(cand, dim=4, m=2, nbits=2)
        ).collect()
    }
    assert codes[100] is None and codes[0] is not None


def test_sampled_ann_tiny_corpus(spark):
    """Sample size caps at the corpus: n_clusters / 2^nbits larger than
    the (non-zero) corpus must degrade gracefully — fewer centroids /
    codewords, never an index error or an empty result."""
    from turbine_maintenance_etl_spark.llm import similarity as S

    cand = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0]),
         (3, [1.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(9, [1.0, 0.5, 0.0, 0.0])], "query_id long, embedding array<double>"
    )
    out = S.ivf_sampled_topk(cand, queries, k=2, n_clusters=16, n_probe=16)
    assert out.count() == 2  # probes every (existing) cluster -> exact
    books = S.fit_pq_sampled(cand, dim=4, m=2, nbits=4)  # 16 codewords > 3 vecs
    assert all(len(b) == 3 for b in books)
    assert S.pq_topk(
        cand, queries, dim=4, k=2, m=2, nbits=4, codebooks=books
    ).count() == 2


def test_srp_buckets_exact_past_plane_31(spark):
    """Bucket ids are bigint: plane 31+ contributions must stay exact
    powers of two (an int accumulator saturates at 2^31-1 under the
    ANSI-off session and silently collides sign patterns)."""
    import pytest

    from pyspark.sql import functions as F

    from turbine_maintenance_etl_spark.llm import similarity as S

    dim = 33
    planes = [[1.0 if j == i else 0.0 for j in range(dim)] for i in range(dim)]
    # vector positive on plane 32 only vs positive on ALL planes
    rows = [
        (1, [1.0 if j == 32 else -1.0 for j in range(dim)]),
        (2, [1.0] * dim),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["b"]
        for r in df.select(
            "vec_id", S.srp_bucket_expr(F.col("embedding"), planes).alias("b")
        ).collect()
    }
    assert got[1] == 1 << 32
    assert got[2] == (1 << dim) - 1
    with pytest.raises(ValueError, match="num_planes"):
        S.srp_bucket_expr(F.col("embedding"), [[0.0] * dim] * 53)


def test_topk_scale_paths_guard_broadcast_query_side(spark):
    """The LSH/IVF/PQ paths broadcast the query frame; a corpus-sized
    query set must be rejected loudly (max_queries), not OOM the
    driver."""
    import pytest

    from turbine_maintenance_etl_spark.llm import similarity as S

    cand = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(5)], "vec_id long, embedding array<double>"
    )
    q = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(30)], "query_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="max_queries=None"):
        S.lsh_bucketed_topk(cand, q, dim=2, max_queries=10)
    with pytest.raises(ValueError, match="max_queries=None"):
        S.ivf_topk(cand, q, max_queries=10)
    # None disables the guard
    assert S.lsh_bucketed_topk(cand, q, dim=2, max_queries=None).count() >= 0


def test_incremental_lsh_match_all_single_execution_plan(spark):
    """Round-7 verdict watch item: under saturated_policy='match_all'
    the batch signature pipeline and the bucket-size aggregation each
    had TWO plan consumers (saturated probe + main probe; ok + sat
    filters) and re-executed per consumer. Both are now barriered —
    the final plan must consume the materialized frames (ExistingRDD
    scans), not re-run the minhash machinery for the batch side."""
    from turbine_maintenance_etl_spark.llm import dedup as D

    docs = spark.createDataFrame(
        [(i, "lorem ipsum dolor sit amet consectetur") for i in range(1, 30)]
        + [(100 + i, f"unique document number {i} about topic {i * 7}") for i in range(5)],
        "doc_id long, text string",
    )
    new_batch = spark.createDataFrame(
        [(1000, "lorem ipsum dolor sit amet consectetur")], "doc_id long, text string"
    )
    index = D.lsh_band_buckets(docs)
    out = D.incremental_lsh_candidates(
        new_batch, index, max_bucket_size=10, saturated_policy="match_all"
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # two barriered frames (batch buckets + bucket sizes) surface as
    # materialized scans in the final plan
    assert plan.count("ExistingRDD") >= 2, plan
    # the batch side's signature pipeline must NOT appear twice: the
    # distinctive per-slot min-aggregation over the hashed shingles runs
    # only for the index side (passed in un-materialized here), i.e. at
    # most one aggregate carrying the mh_ signature columns
    import re

    sig_aggs = len(re.findall(r"HashAggregate[^\n]*mh_0", plan))
    assert sig_aggs <= 1, f"batch signature pipeline re-executed:\n{plan}"
    # semantics unchanged by the barriers
    assert {(r["new_id"], r["existing_id"]) for r in out.collect()} == {(1000, None)}
