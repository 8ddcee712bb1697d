"""Byte-pair-encoding tokenization — a REAL trained BPE (Sennrich et
al. 2016 / the GPT-2 tokenizer shape), not the regex word-piece
estimate in ``text.bpe_ish_token_count_expr`` (kept as the zero-Python
fast path).

Spark-first split of the work, mirroring how the IVF quantizer trains:

- **TRAIN on a bounded aggregate, not the corpus.** BPE training needs
  word frequencies, not documents: one Spark aggregation collapses
  100 TB of text into a vocabulary-sized (word, count) table, and the
  driver learns merges from the top ``max_words`` rows (deterministic
  tie-breaks). Driver memory is bounded by the vocabulary cap, and the
  merge loop is pure Python over ~1e4 dict entries — the same reasoning
  as FAISS training its quantizer on a sample.
- **APPLY distributed, Arrow-batched.** The learned merge ranks ship to
  executors once (closure broadcast); ``mapInPandas`` applies them per
  document with a per-batch word cache (real corpora repeat words
  heavily, so each distinct word is encoded once per batch, not once
  per occurrence). This is the documented escape-hatch pattern: the
  per-word merge loop is genuinely iterative and not expressible as
  Catalyst expressions.

Determinism: merges are learned with (count DESC, pair ASC) tie-breaks
and applied by rank — same corpus, same merges, same token counts, on
any partitioning (pytest-pinned differential vs a pure-Python oracle).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from turbine_maintenance_etl_spark.llm.text import tokens_expr

EOW = "</w>"  # end-of-word marker: lets merges learn word-final units


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    max_words: int = 50_000,
) -> list[tuple[str, int]]:
    """(word, count) for the ``max_words`` most frequent lowercase
    whitespace words — ONE corpus aggregation, deterministic order
    (count DESC, word ASC), bounded collect."""
    freqs = (
        df.select(F.explode(tokens_expr(F.lower(F.col(text_col)))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["c"]) for r in freqs]


def learn_merges(
    word_freqs: list[tuple[str, int]], num_merges: int = 200
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency table: count
    adjacent symbol pairs weighted by word frequency, merge the most
    frequent pair (ties break lexicographically), repeat. Pure Python on
    the driver — the input is vocabulary-sized, never the corpus."""
    words: dict[tuple[str, ...], int] = {
        tuple(w) + (EOW,): c for w, c in word_freqs
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, c in words.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        top = max(pair_counts.values())
        best_pair = min(p for p, c in pair_counts.items() if c == top)
        if top < 2:
            break  # every remaining pair is unique; merging stops helping
        merges.append(best_pair)
        merged = best_pair[0] + best_pair[1]
        new_words: dict[tuple[str, ...], int] = {}
        for sym, c in words.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == best_pair[0] and sym[i + 1] == best_pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
        words = new_words
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word by rank priority (the GPT-2
    ``bpe()`` loop): repeatedly merge the lowest-rank adjacent pair."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        pairs = [(ranks.get((sym[i], sym[i + 1])), i) for i in range(len(sym) - 1)]
        ranked = [(r, i) for r, i in pairs if r is not None]
        if not ranked:
            break
        _, i = min(ranked)
        sym[i : i + 2] = [sym[i] + sym[i + 1]]
    return sym


def train_bpe(
    df: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """One-call training: corpus → word-frequency aggregate → merges."""
    return learn_merges(word_frequencies(df, text_col, max_words), num_merges)


def bpe_token_stats(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_words, n_bpe_tokens) per document under the trained
    merges — ``mapInPandas`` with a BOUNDED per-partition word cache,
    Arrow-batched, deterministic on any partitioning (the cache only
    memoizes a pure function, so its size/reset policy can never change
    a result)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    # the id passes through untouched, so its output type is whatever
    # the input schema says (string doc ids work too) — never a
    # hardcoded long
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, n_words long, n_bpe_tokens long"

    def run(batches: Iterator) -> Iterator:
        import re

        import pandas as pd

        # ASCII \s+ to MATCH the training side's Java-regex tokens_expr
        # split — Python str.split() breaks on Unicode whitespace
        # (e.g.  ) that training treats as part of the word, which
        # would desync apply-side words from the trained frequency table
        ws = re.compile(r"\s+", re.ASCII)
        # the cache spans the whole input partition (not one batch), so
        # it must be BOUNDED: web-scale partitions carry effectively
        # unbounded distinct 'words' (urls, hex ids, typos) and an
        # uncapped dict grows until the Python worker OOMs. Zipf says
        # the hot words that matter are cached long before the cap.
        cache: dict[str, int] = {}
        cache_cap = 2_000_000  # ~100 MB ceiling at avg word sizes

        def count_tokens(text: str) -> tuple[int, int]:
            words = [w for w in ws.split((text or "").lower()) if w]
            total = 0
            for w in words:
                n = cache.get(w)
                if n is None:
                    n = len(encode_word(w, ranks))
                    if len(cache) >= cache_cap:
                        cache.clear()  # cheap reset; hot words re-enter fast
                    cache[w] = n
                total += n
            return len(words), total

        for pdf in batches:
            counted = pdf[text_col].map(count_tokens)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_words": counted.map(lambda t: t[0]),
                    "n_bpe_tokens": counted.map(lambda t: t[1]),
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema)
