"""Property-based checks for the text/governance/tokenize tier: the
in-row Catalyst folds must match straightforward Python references on
arbitrary token streams (mirrors the reference's fuzz strategy,
SURVEY.md section 5)."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings, strategies as st

TOKENS = st.lists(
    st.sampled_from(["a", "b", "ab", "ba", "x", "yy", "the"]),
    min_size=1,
    max_size=24,
)


def _mk_docs(spark, token_lists):
    return spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_lists)],
        "doc_id long, text string",
    )


@settings(max_examples=4, deadline=None)
@given(st.lists(TOKENS, min_size=1, max_size=6))
def test_repetition_matches_python(spark, token_lists):
    from dask_array_spark.functions.text import repetition_stats

    out = {
        r["doc_id"]: r
        for r in repetition_stats(_mk_docs(spark, token_lists)).collect()
    }
    for i, toks in enumerate(token_lists):
        text = " ".join(toks)
        bigrams = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
        if bigrams:
            counts = Counter(bigrams)
            best_n = max(counts.values())
            best_g = min(g for g, c in counts.items() if c == best_n)
            exp_top = round(best_n * len(best_g) / len(text), 6)
        else:
            exp_top = 0.0
        trigrams = [" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)]
        exp_dup = (
            round((len(trigrams) - len(set(trigrams))) / len(trigrams), 6)
            if trigrams
            else 0.0
        )
        run = best = 1
        for j in range(1, len(toks)):
            run = run + 1 if toks[j] == toks[j - 1] else 1
            best = max(best, run)
        row = out[i]
        assert abs(row["top2gram_char_frac"] - exp_top) < 1e-9, (i, toks)
        assert abs(row["dup3gram_frac"] - exp_dup) < 1e-9, (i, toks)
        assert row["max_token_run"] == best, (i, toks)


@settings(max_examples=4, deadline=None)
@given(TOKENS, st.integers(1, 8), st.integers(1, 8))
def test_chunks_reassemble(spark, toks, window, stride):
    """Chunks at any (window, stride) start at multiples of stride,
    are at most window wide, and with stride <= window jointly cover
    every token in order."""
    from dask_array_spark.functions.tokenize import chunk_tokens

    docs = _mk_docs(spark, [toks])
    rows = chunk_tokens(docs, window=window, stride=stride).orderBy("chunk_id").collect()
    assert rows, toks
    for r in rows:
        start = r["chunk_id"] * stride
        assert r["chunk_text"].split(" ") == toks[start : start + window]
    assert all(r["n_tokens"] > 0 for r in rows)  # never an empty chunk
    last = rows[-1]
    if stride <= window:
        # full coverage, and the final chunk reaches the last token
        seen = set()
        for r in rows:
            seen.update(range(r["chunk_id"] * stride, r["chunk_id"] * stride + r["n_tokens"]))
        assert seen == set(range(len(toks)))
        assert last["chunk_id"] * stride + last["n_tokens"] == len(toks)
    else:
        # gapped sampling: one chunk per stride multiple below n
        assert len(rows) == -(-len(toks) // stride)


@settings(max_examples=4, deadline=None)
@given(st.lists(st.integers(1, 40), min_size=1, max_size=30), st.integers(10, 60))
def test_pack_matches_python_nextfit(spark, lengths, budget):
    from dask_array_spark.functions.tokenize import pack_sequences

    docs = _mk_docs(spark, [["w"] * n for n in lengths])
    out = pack_sequences(docs, budget=budget, n_groups=1).orderBy("doc_id").collect()
    bins, fill, cur = [], 0, 0
    for n in lengths:
        if fill > 0 and fill + n > budget:
            cur += 1
            fill = 0
        bins.append(cur)
        fill += n
    assert [r["bin_id"] for r in out] == bins, (lengths, budget)


@settings(max_examples=4, deadline=None)
@given(st.lists(TOKENS, min_size=1, max_size=5))
def test_tfidf_keywords_matches_python(spark, token_lists):
    """tfidf_keywords == the smoothed tf-idf formula + (score desc,
    token asc) ranking computed in plain Python."""
    import math

    from dask_array_spark.functions.text import tfidf_keywords

    docs = _mk_docs(spark, token_lists)
    got = {}
    for r in tfidf_keywords(docs, k=2).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["token"], round(r["tfidf"], 6))
        )
    for d in got:
        got[d].sort()

    n = len(token_lists)
    df_counts = Counter()
    for toks in token_lists:
        for t in set(toks):
            df_counts[t] += 1
    want = {}
    for i, toks in enumerate(token_lists):
        tf = Counter(toks)
        scored = sorted(
            (
                (-round(c * (math.log((n + 1) / (df_counts[t] + 1)) + 1), 6), t)
                for t, c in tf.items()
            ),
        )[:2]
        want[i] = [
            (rk + 1, t, round(-s, 6)) for rk, (s, t) in enumerate(scored)
        ]
    assert got == want


@settings(max_examples=4, deadline=None)
@given(st.lists(TOKENS, min_size=1, max_size=5))
def test_oov_rate_matches_python(spark, token_lists):
    from dask_array_spark.functions.tokenize import oov_rate, vocab_top_k

    docs = _mk_docs(spark, token_lists)
    vocab = {r["token"] for r in vocab_top_k(docs, k=3).collect()}
    out = {r["doc_id"]: r for r in oov_rate(docs, k=3).collect()}
    for i, toks in enumerate(token_lists):
        n_oov = sum(1 for t in toks if t not in vocab)
        assert out[i]["n_tokens"] == len(toks)
        assert out[i]["n_oov"] == n_oov
        assert abs(out[i]["oov_rate"] - round(n_oov / len(toks), 6)) < 1e-9
