"""Property-based fuzz of the tokenizer-pipeline tier (chunk_tokens,
pack_sequences, bpe_token_count, vocab_top_k, oov_rate both probe
routes, shuffle_shards invariants) vs plain-Python models.

Completes the LLM-pipeline fuzz coverage: dedup, substr, governance,
text, and similarity each got a model-differential suite in round 7;
tokenize was the remaining tier.  Texts are random token streams over
a tiny alphabet so vocabulary collisions, empty documents, and
single-token documents all occur naturally.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st


TOK = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "f!", "7", "x9y"])
DOC = st.lists(TOK, min_size=0, max_size=20).map(lambda t: " ".join(t))
CORPUS = st.lists(DOC, min_size=1, max_size=8)


def _df(spark, docs):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )


# ------------------------------------------------------------- chunking


def _chunks_model(text, window, stride):
    toks = [t for t in text.split(" ") if t]
    n = len(toks)
    if n == 0:
        return []
    if stride < window:
        n_chunks = 1 + -(-max(n - window, 0) // stride)
    else:
        n_chunks = -(-n // stride)
    out = []
    for c in range(n_chunks):
        piece = toks[c * stride : c * stride + window]
        out.append((c, len(piece), " ".join(piece)))
    return out


@settings(max_examples=4, deadline=None)
@given(CORPUS, st.integers(1, 6), st.integers(1, 8))
def test_chunk_tokens_model(spark, docs, window, stride):
    from dask_array_spark.functions.tokenize import chunk_tokens

    rows = chunk_tokens(_df(spark, docs), window=window, stride=stride).collect()
    got = sorted((r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk_text"]) for r in rows)
    want = sorted(
        (i, c, n, txt)
        for i, d in enumerate(docs)
        for (c, n, txt) in _chunks_model(d, window, stride)
    )
    assert got == want


# ------------------------------------------------------------- packing


def _pack_model(doc_lens, budget, n_groups):
    """(doc_id, group, bin) under greedy next-fit in doc_id order."""
    out = {}
    for g in range(n_groups):
        fill, cur = 0, 0
        for i, n in sorted((i, n) for i, n in doc_lens.items() if i % n_groups == g):
            if fill > 0 and fill + n > budget:
                cur += 1
                fill = 0
            out[i] = (g, cur)
            fill += n
    return out


@settings(max_examples=4, deadline=None)
@given(CORPUS, st.integers(1, 12), st.integers(1, 4))
def test_pack_sequences_model(spark, docs, budget, n_groups):
    from dask_array_spark.functions.tokenize import pack_sequences

    rows = pack_sequences(_df(spark, docs), budget=budget, n_groups=n_groups).collect()
    lens = {i: len([t for t in d.split(" ") if t]) for i, d in enumerate(docs)}
    want = _pack_model(lens, budget, n_groups)
    assert len(rows) == len(docs)
    for r in rows:
        g, b = want[r["doc_id"]]
        assert (r["group_id"], r["bin_id"], r["n_tokens"]) == (g, b, lens[r["doc_id"]])


# ------------------------------------------------------------- BPE count


@settings(max_examples=4, deadline=None)
@given(CORPUS)
def test_bpe_token_count_model(spark, docs):
    from dask_array_spark.functions.tokenize import BPE_PATTERN, bpe_token_count

    rows = bpe_token_count(_df(spark, docs)).collect()
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in rows}
    pat = re.compile(BPE_PATTERN)
    assert got == {i: len(pat.findall(d)) for i, d in enumerate(docs)}


# ------------------------------------------------------------- vocabulary


@settings(max_examples=4, deadline=None)
@given(CORPUS, st.integers(1, 6))
def test_vocab_top_k_model(spark, docs, k):
    from dask_array_spark.functions.tokenize import vocab_top_k

    rows = vocab_top_k(_df(spark, docs), k=k).collect()
    cnt = Counter(t for d in docs for t in d.split(" ") if t)
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    got = [(r["token"], r["n"]) for r in sorted(rows, key=lambda r: r["rank"])]
    assert got == want
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
        range(1, len(want) + 1)
    )


# ------------------------------------------------------------- OOV rate


@settings(max_examples=4, deadline=None)
@given(CORPUS, st.integers(1, 5), st.sampled_from(["inrow", "join"]))
def test_oov_rate_model_both_probes(spark, docs, k, probe):
    from dask_array_spark.functions.tokenize import oov_rate

    rows = oov_rate(_df(spark, docs), k=k, probe=probe).collect()
    cnt = Counter(t for d in docs for t in d.split(" ") if t)
    vocab = {t for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]}
    assert len(rows) == len(docs)
    for r in rows:
        toks = [t for t in docs[r["doc_id"]].split(" ") if t]
        n_oov = sum(1 for t in toks if t not in vocab)
        assert (r["n_tokens"], r["n_oov"]) == (len(toks), n_oov)
        # empty docs rate 0.0 by contract (tokenize._rate's otherwise)
        want_rate = round(n_oov / len(toks), 6) if toks else 0.0
        assert r["oov_rate"] == pytest.approx(want_rate)


# ------------------------------------------------------------- shard shuffle


@settings(max_examples=4, deadline=None)
@given(st.integers(1, 40), st.integers(1, 6), st.sampled_from(["s1", "s2"]))
def test_shuffle_shards_invariants(spark, n_docs, n_shards, seed):
    from dask_array_spark.functions.tokenize import shuffle_shards

    docs = [f"d{i}" for i in range(n_docs)]
    df = _df(spark, docs)
    rows = shuffle_shards(df, n_shards=n_shards, seed=seed).collect()
    again = shuffle_shards(df, n_shards=n_shards, seed=seed).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))  # deterministic
    assert sorted(r["doc_id"] for r in rows) == list(range(n_docs))  # permutation
    by_shard = {}
    for r in rows:
        assert 0 <= r["shard"] < n_shards
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():  # dense 0..count-1 positions per shard
        assert sorted(poss) == list(range(len(poss)))
