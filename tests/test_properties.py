"""Property-based tests (hypothesis): random inputs, invariant checks.

Spark round-trips are slow, so example counts are small but each
example is adversarial (random keys/timestamps/sizes, including
empties and ties)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1)


def _ts(s: int) -> dt.datetime:
    return BASE + dt.timedelta(seconds=int(s))


@st.composite
def asof_case(draw):
    keys = st.integers(1, 3)
    left = draw(
        st.lists(st.tuples(keys, st.integers(0, 100)), min_size=1, max_size=12)
    )
    right_raw = draw(
        st.lists(st.tuples(keys, st.integers(0, 100)), min_size=0, max_size=12)
    )
    # unique (key, ts) on the right: equal-ts duplicates make the winner
    # engine-order-dependent in BOTH engines (not a semantics difference)
    right = {kt: float(i) for i, kt in enumerate(dict.fromkeys(right_raw))}
    return left, sorted((k, t, v) for (k, t), v in right.items())


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(asof_case())
def test_asof_join_matches_pandas_merge_asof(spark, case):
    from turbine_maintenance_etl_spark.ops.asof import asof_join

    left_rows, right_rows = case
    left = spark.createDataFrame(
        [(k, _ts(t), i) for i, (k, t) in enumerate(left_rows)],
        "k int, ts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [(k, _ts(t), v) for k, t, v in right_rows] or [],
        "k int, ts timestamp, price double",
    )
    got = {
        r["lid"]: r["asof_price"]
        for r in asof_join(left, right, on=["k"], tie_break="lid").collect()
    }

    lpdf = pd.DataFrame(
        [(k, _ts(t), i) for i, (k, t) in enumerate(left_rows)],
        columns=["k", "ts", "lid"],
    ).sort_values("ts", kind="stable")
    rpdf = pd.DataFrame(
        [(k, _ts(t), v) for k, t, v in right_rows], columns=["k", "ts", "price"]
    ).sort_values("ts", kind="stable")
    if len(rpdf):
        expected = pd.merge_asof(lpdf, rpdf, on="ts", by="k", direction="backward")
    else:
        expected = lpdf.assign(price=float("nan"))
    exp = {
        int(r.lid): (None if pd.isna(r.price) else float(r.price))
        for r in expected.itertuples()
    }
    assert got == exp


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(0, 120),
    chunk=st.integers(2, 40),
    data=st.data(),
)
def test_chunker_invariants(spark, n, chunk, data):
    from turbine_maintenance_etl_spark.llm.text import chunk_documents

    overlap = data.draw(st.integers(0, chunk - 1))
    text = " ".join(f"t{i}" for i in range(n))
    docs = spark.createDataFrame([(1, text)], "doc_id int, text string")
    rows = sorted(
        (r["chunk_id"], r["chunk_text"].split(), r["chunk_tokens"])
        for r in chunk_documents(docs, chunk, overlap).collect()
    )
    chunks = [toks for _, toks, _ in rows]
    if n == 0:
        assert chunks == []
        return
    # chunk_ids contiguous from 0; sizes within bounds; counts accurate
    assert [cid for cid, _, _ in rows] == list(range(len(rows)))
    assert all(1 <= len(c) <= chunk for c in chunks)
    assert all(ct == len(c) for _, c, ct in rows)
    # full coverage, in order, no token invented
    assert set().union(*map(set, chunks)) == {f"t{i}" for i in range(n)}
    # consecutive chunks share exactly `overlap` tokens
    for a, b in zip(chunks, chunks[1:]):
        shared = [t for t in b if t in set(a)]
        assert len(shared) == overlap
        if overlap:
            assert a[-overlap:] == b[:overlap]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 2), st.floats(-1e6, 1e6)), min_size=2, max_size=30
    )
)
def test_group_zscore_properties(spark, rows):
    """Non-constant groups: z-scores have mean ~0 and pop-std ~1;
    constant groups: all NULL."""
    from turbine_maintenance_etl_spark.ops.grouped_map import grouped_map_zscore

    df = spark.createDataFrame(
        [("D", k, i, v) for i, (k, v) in enumerate(rows)],
        "dataset string, unit_nr int, time_cycles int, sensor2 double",
    )
    import numpy as np

    out = grouped_map_zscore(df, ["sensor2"]).toPandas()
    for unit, grp in out.groupby("unit_nr"):
        src = [v for k, v in rows if k == unit]
        # "constant" must be judged in float64, exactly as the engine
        # computes it: distinct values whose variance UNDERFLOWS to 0
        # (e.g. [0.0, 2e-313]) are constant-in-float → z is NULL
        if len(src) < 2 or np.std(src) == 0:
            assert grp["z_sensor2"].isna().all()
        else:
            z = grp["z_sensor2"]
            # tolerance 1e-4, not 1e-6: when the group's spread is a few
            # ulps of its magnitude (hypothesis loves adjacent denormals
            # like 1.175494350e-38 vs 1.175494351e-38), float64
            # cancellation makes z = ±1.000001 with no engine error at
            # all; a real ddof/mean bug shows up at O(1e-2), far above.
            assert abs(z.mean()) < 1e-4
            assert abs((z**2).mean() - 1.0) < 1e-4


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "bb", "ccc", "a", "#", "..."]),
            min_size=0, max_size=12,
        ),
        min_size=1, max_size=6,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_repetition_signals_match_python_reference(spark, docs):
    """Differential property test: the zero-shuffle expression pipeline
    equals a direct Python computation on arbitrary token multisets."""
    from collections import Counter

    from turbine_maintenance_etl_spark.llm.quality import repetition_signals

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_signals(df).collect()}

    for i, toks in enumerate(docs):
        r = got[i]
        n = len(toks)
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        assert r["n_words"] == n and r["n_bigrams"] == len(bgs)
        if n == 0:
            assert r["dup_word_frac"] is None
            continue
        assert r["dup_word_frac"] == round((n - len(set(toks))) / n, 4)
        assert r["mean_word_len"] == round(sum(map(len, toks)) / n, 4)
        text = " ".join(toks)
        n_sym = text.count("#") + text.count("...")
        assert r["symbol_word_ratio"] == round(n_sym / n, 4)
        if bgs:
            c = Counter(bgs)
            assert r["top_bigram_frac"] == round(max(c.values()) / len(bgs), 4)
            assert r["dup_bigram_frac"] == round(
                (len(bgs) - len(c)) / len(bgs), 4
            )
        else:
            assert r["top_bigram_frac"] is None


# ---------------------------------------------------------------------------
# LM perplexity: Spark pipeline == pure-Python reference on random corpora
# ---------------------------------------------------------------------------

def _ref_perplexity(texts: dict[int, str], k: float = 0.5):
    """Pure-Python add-k bigram LM (train = score corpus), mirroring
    llm/lm.py semantics: lowercase ASCII-ws split, <s> prefix, unseen
    history -> uniform 1/V."""
    import math
    import re

    ws = re.compile(r"\s+", re.ASCII)
    grams: dict[int, list[tuple[str, str]]] = {}
    big: dict[tuple[str, str], int] = {}
    hist: dict[str, int] = {}
    for i, t in texts.items():
        toks = ["<s>"] + [w for w in ws.split(t.lower()) if w]
        gs = list(zip(toks, toks[1:]))
        grams[i] = gs
        for g in gs:
            big[g] = big.get(g, 0) + 1
            hist[g[0]] = hist.get(g[0], 0) + 1
    v = len({w2 for _, w2 in big})
    out = {}
    for i, gs in grams.items():
        if not gs:
            out[i] = (0, None, None)
            continue
        lps = []
        for g in gs:
            c1 = hist.get(g[0])
            if c1 is None:
                lps.append(math.log(1.0 / v))
            else:
                lps.append(math.log((big.get(g, 0) + k) / (c1 + k * v)))
        avg = sum(lps) / len(lps)
        out[i] = (len(gs), round(avg, 4), round(math.exp(-avg), 4))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(
            alphabet="ab cd\tx.",  # tiny alphabet -> heavy gram collisions
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_lm_perplexity_matches_reference(spark, texts):
    from turbine_maintenance_etl_spark.llm.lm import perplexity_scores

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # degenerate corpus (zero bigrams anywhere) has no vocabulary; the
    # operator contract starts at |V| >= 1
    want = _ref_perplexity(dict(rows))
    if all(n == 0 for n, _, _ in want.values()):
        return
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"], r["perplexity"])
        for r in perplexity_scores(df).collect()
    }
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "cc", "d"]), min_size=0, max_size=14),
        min_size=1,
        max_size=6,
    ),
    n=st.integers(2, 4),
)
def test_duplicated_span_stats_match_python_reference(spark, docs, n):
    """Differential property test: the distributed span-dedup pipeline
    (positional n-gram hash -> per-key count -> interval-union coverage)
    equals a direct Python computation on arbitrary small corpora, for
    every n. Tiny alphabet so cross-document span collisions actually
    happen."""
    from collections import Counter

    from turbine_maintenance_etl_spark.llm.dedup import duplicated_span_stats

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in duplicated_span_stats(df, n=n, min_count=2).collect()
    }

    # pure-Python reference
    grams: Counter = Counter()
    positions: dict[int, list[tuple[int, str]]] = {}
    for i, toks in enumerate(docs):
        spans = [
            (p, " ".join(toks[p : p + n])) for p in range(len(toks) - n + 1)
        ]
        positions[i] = spans
        grams.update(g for _, g in spans)

    for i, toks in enumerate(docs):
        dup = [(p, g) for p, g in positions[i] if grams[g] >= 2]
        covered = set()
        for p, _ in dup:
            covered.update(range(p, p + n))
        r = got[i]
        assert r["n_tokens"] == len(toks)
        assert r["n_dup_spans"] == len(dup)
        assert r["n_dup_tokens"] == len(covered)
        if len(toks):
            assert abs(r["dup_frac"] - round(len(covered) / len(toks), 6)) < 1e-9
        else:
            assert r["dup_frac"] is None


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.integers(-3, 3), min_size=4, max_size=4),
        min_size=2,
        max_size=20,
    )
)
def test_ivf_sampled_full_probe_equals_brute_force(spark, vecs):
    """Probing every cluster makes the sampled-quantizer IVF EXACT:
    partition pruning only drops candidates, and with n_probe ==
    n_clusters nothing is pruned, so the (query, neighbor, cosine,
    rank) set must equal brute force's on any input — including
    all-zero vectors (excluded on both paths) and duplicate vectors
    (id tie-break)."""
    from turbine_maintenance_etl_spark.llm import similarity as S

    cand = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    queries = cand.limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = sorted(map(tuple, S.brute_force_topk(cand, queries, k=3).collect()))
    ivf = sorted(
        map(
            tuple,
            S.ivf_sampled_topk(
                cand, queries, k=3, n_clusters=4, n_probe=4
            ).collect(),
        )
    )
    assert ivf == bf


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.integers(-3, 3), min_size=4, max_size=4),
        min_size=1,
        max_size=15,
    )
)
def test_pq_sampled_covering_codebooks_equal_brute_force(spark, vecs):
    """When the hash-ordered sample covers the whole (non-zero) corpus
    (2^nbits >= N), every vector's own subvectors are codewords, the
    encode argmin hits distance 0, reconstruction is EXACT (a distance-0
    tie can only pick a codeword with identical values), and pq_topk
    must return exactly brute force's result on any input."""
    from turbine_maintenance_etl_spark.llm import similarity as S

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    rows.append((999, [1.0, 2.0, -1.0, 0.5]))  # >=1 usable vector always
    cand = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = cand.limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = sorted(map(tuple, S.brute_force_topk(cand, queries, k=3).collect()))
    books = S.fit_pq_sampled(cand, dim=4, m=2, nbits=4)  # 16 >= N
    pq = sorted(
        map(
            tuple,
            S.pq_topk(
                cand, queries, dim=4, k=3, m=2, nbits=4, codebooks=books
            ).collect(),
        )
    )
    assert pq == bf


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.integers(-3, 3), min_size=4, max_size=4),
        min_size=2,
        max_size=14,
    ),
    st.sampled_from([1, 2]),
)
def test_ivfpq_sampled_matches_python_reference(spark, vecs, n_probe):
    """The COMPOSED sampled IVF-PQ path (fit_ivfpq_sampled +
    ivfpq_sampled_topk) against a from-scratch pure-Python reference
    replaying every determinism rule: md5(id) sample order, rounded-
    cosine argmax assignment (Decimal HALF_UP, ties to lowest cid),
    residual codebooks offset past the centroid sample, left-assoc
    squared-L2 encode (ties to lowest code), centroid+residual
    reconstruction, probed asymmetric cosine top-k. Pins the
    distributed plumbing == the math independently of the DuckDB
    oracle twin."""
    import hashlib
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from turbine_maintenance_etl_spark.llm import similarity as S

    dim, n_clusters, m, nbits, k = 4, 2, 2, 1, 3
    dsub, ksub = dim // m, 1 << nbits
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    # guarantee enough non-zero vectors for fit (2 centroids + 2 sample)
    rows += [
        (990, [1.0, 2.0, -1.0, 0.5]),
        (991, [-2.0, 1.0, 3.0, -0.5]),
        (992, [0.5, -1.5, 2.5, 1.0]),
        (993, [3.0, 0.5, -2.0, 1.5]),
    ]

    def rnd6(x: float) -> float:
        return float(Decimal(x).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    def norm(v):
        acc = 0.0
        for x in v:
            acc += x * x
        return math.sqrt(acc)

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def cosr(a, b):
        return rnd6(dot(a, b) / (norm(a) * norm(b)))

    nz = [(i, v) for i, v in rows if norm(v) > 0]
    order = sorted(nz, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]))
    ctr = [v for _, v in order[:n_clusters]]

    def assign(v):
        return max(range(len(ctr)), key=lambda i: (cosr(v, ctr[i]), -i))

    books = [[None] * ksub for _ in range(m)]
    for code, (_, v) in enumerate(order[n_clusters : n_clusters + ksub]):
        cid = assign(v)
        resid = [v[j] - ctr[cid][j] for j in range(dim)]
        for s in range(m):
            books[s][code] = resid[s * dsub : (s + 1) * dsub]

    def encode_recon(v):
        cid = assign(v)
        resid = [v[j] - ctr[cid][j] for j in range(dim)]
        out = list(ctr[cid])
        for s in range(m):
            rsub = resid[s * dsub : (s + 1) * dsub]

            def dist(c):
                acc = 0.0
                for j in range(dsub):
                    d = rsub[j] - books[s][c][j]
                    acc = acc + d * d
                return acc

            code = min(range(ksub), key=lambda c: (dist(c), c))
            for j in range(dsub):
                out[s * dsub + j] = ctr[cid][s * dsub + j] + books[s][code][j]
        return cid, out

    recon = {i: encode_recon(v) for i, v in nz}
    qids = [i for i, _ in nz][:3]
    expected = set()
    for qid in qids:
        qv = dict(nz)[qid]
        probes = sorted(range(len(ctr)), key=lambda i: (-cosr(qv, ctr[i]), i))[:n_probe]
        scored = []
        for nid, (cid, rv) in recon.items():
            if nid == qid or cid not in probes:
                continue
            den = norm(qv) * norm(rv)
            if den == 0:
                continue
            scored.append((nid, rnd6(dot(qv, rv) / den)))
        scored.sort(key=lambda t: (-t[1], t[0]))
        for rank, (nid, cos) in enumerate(scored[:k], 1):
            expected.add((qid, nid, cos, rank))

    cand = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = (
        cand.filter(F.col("vec_id").isin(qids))
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    got = set(
        map(
            tuple,
            S.ivfpq_sampled_topk(
                cand, queries, dim=dim, k=k, n_clusters=n_clusters,
                n_probe=n_probe, m=m, nbits=nbits,
            ).collect(),
        )
    )
    assert got == expected
