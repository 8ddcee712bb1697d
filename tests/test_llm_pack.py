"""Hand-computed tests for sequence packing (llm/pack.py); the sf-data
path is oracle-checked in test_oracle.py via a recursive-CTE twin."""

from __future__ import annotations

from turbine_maintenance_etl_spark.llm.pack import pack_sequences


def test_pack_sequences_hand_computed(spark):
    rows = [
        # shard A: 100+100 fit in 256, +100 overflows -> seq 2;
        # then an oversized 300-token chunk -> its own seq 3;
        # then 50 -> seq 4 (300 left the budget overfull).
        ("A", 1, 0, 100),
        ("A", 1, 1, 100),
        ("A", 2, 0, 100),
        ("A", 2, 1, 300),
        ("A", 3, 0, 50),
        # shard B packs independently.
        ("B", 9, 0, 256),
        ("B", 9, 1, 1),
    ]
    df = spark.createDataFrame(
        rows, "shard string, doc_id long, chunk_id long, chunk_tokens long"
    )
    got = {
        (r["shard"], r["doc_id"], r["chunk_id"]): r["seq_no"]
        for r in pack_sequences(df, max_tokens=256).collect()
    }
    assert got == {
        ("A", 1, 0): 1,
        ("A", 1, 1): 1,
        ("A", 2, 0): 2,
        ("A", 2, 1): 3,
        ("A", 3, 0): 4,
        ("B", 9, 0): 1,
        ("B", 9, 1): 2,
    }


def test_pack_sequences_budget_invariant(spark):
    """Every multi-chunk sequence respects the budget, and consecutive
    sequences couldn't be merged (greedy is maximal)."""
    import random

    rng = random.Random(7)
    rows = [
        ("S", i, 0, rng.randint(10, 120)) for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "shard string, doc_id long, chunk_id long, chunk_tokens long"
    )
    out = pack_sequences(df, max_tokens=256).toPandas().sort_values(["doc_id"])
    by_seq = out.groupby("seq_no")["chunk_tokens"].sum()
    sizes = out.groupby("seq_no")["chunk_tokens"].count()
    # multi-chunk sequences never exceed the budget
    assert (by_seq[sizes > 1] <= 256).all()
    # greedy maximality: seq k's first chunk would overflow seq k-1
    firsts = out.drop_duplicates("seq_no", keep="first").set_index("seq_no")[
        "chunk_tokens"
    ]
    for k in range(2, int(out["seq_no"].max()) + 1):
        assert by_seq[k - 1] + firsts[k] > 256


def test_pack_sequences_derives_types_from_input(spark):
    """String doc ids and non-string shards must round-trip — output
    types are derived from the input schema, not hardcoded."""
    import pytest

    from turbine_maintenance_etl_spark.llm.pack import pack_sequences

    chunks = spark.createDataFrame(
        [(7, "doc-a", 0, 30), (7, "doc-a", 1, 30), (7, "doc-b", 0, 50)],
        "shard int, doc_id string, chunk_id int, chunk_tokens int",
    )
    got = pack_sequences(chunks, max_tokens=64).collect()
    assert {r["doc_id"] for r in got} == {"doc-a", "doc-b"}
    assert all(isinstance(r["shard"], int) for r in got)
    seqs = {(r["doc_id"], r["chunk_id"]): r["seq_no"] for r in got}
    assert seqs[("doc-a", 0)] == 1 and seqs[("doc-a", 1)] == 1
    assert seqs[("doc-b", 0)] == 2  # 30+30+50 > 64 → new sequence

    with pytest.raises(ValueError, match="lacks column"):
        pack_sequences(chunks.drop("chunk_tokens"))
