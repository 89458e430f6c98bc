"""Property-based fuzz of the governance tier (decontamination,
deterministic splits, stratified sampling, mixture downsampling,
functions/governance.py) against plain-Python models of the published
hash spec -- random corpora and benchmark sets with deliberate n-gram
overlap, arbitrary split weights and mixture rates."""

from __future__ import annotations

from collections import defaultdict

import pytest
from hypothesis import given, settings, strategies as st

P = 1_000_000_007
SEED = 7
M_COMB = 1_000_003
A_MIX = 2_654_435_761
N = 3  # n-gram size for the contamination check


def py_polyhash(s: str) -> int:
    acc = SEED
    for ch in s:
        acc = (acc * 31 + ord(ch)) % P
    return acc


def py_ngrams(text: str, n: int = N) -> set:
    th = [py_polyhash(t) for t in text.split(" ") if t]
    out = set()
    for i in range(len(th) - n + 1):
        h = th[i]
        for k in range(1, n):
            h = (h * M_COMB + th[i + k]) % P
        out.add(h)
    return out


WORDS = ["q1", "q2", "q3", "q4", "q5", "q6", "the", "of"]
DOC = st.lists(st.sampled_from(WORDS), min_size=1, max_size=12)


@st.composite
def corpus_and_bench(draw):
    docs = [list(d) for d in draw(st.lists(DOC, min_size=2, max_size=5))]
    bench = [list(d) for d in draw(st.lists(DOC, min_size=1, max_size=3))]
    # plant real contamination: splice benchmark slices into some docs
    for _ in range(draw(st.integers(0, 2))):
        src = draw(st.sampled_from(bench))
        if len(src) >= N:
            host = draw(st.sampled_from(docs))
            at = draw(st.integers(0, len(host)))
            host[at:at] = src[: draw(st.integers(N, len(src)))]
    return [" ".join(d) for d in docs], [" ".join(b) for b in bench]


def _df(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


@settings(max_examples=4, deadline=None)
@given(corpus_and_bench())
def test_contamination_counts_matches_python(spark, data):
    from dask_array_spark.functions import governance as G

    texts, bench = data
    got = {
        r["doc_id"]: (r["n_contam"], r["contaminated"])
        for r in G.contamination_counts(
            _df(spark, texts), _df(spark, bench), n=N
        ).collect()
    }
    bench_ng = set().union(*(py_ngrams(b) for b in bench)) if bench else set()
    exp = {
        i: (len(py_ngrams(t) & bench_ng), len(py_ngrams(t) & bench_ng) > 0)
        for i, t in enumerate(texts)
    }
    assert got == exp


@settings(max_examples=4, deadline=None)
@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
    st.sampled_from([(80, 10, 10), (60, 20, 20), (98, 1, 1), (0, 50, 50)]),
    st.sampled_from(["s1", "k9"]),
)
def test_assign_split_matches_python(spark, ids, weights, salt):
    from dask_array_spark.functions import governance as G

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["split"]
        for r in G.assign_split(df, weights=weights, salt=salt).collect()
    }
    t_end, v_end = weights[0], weights[0] + weights[1]
    exp = {}
    for i in ids:
        b = py_polyhash(f"{salt}:{i}") % 100
        exp[i] = "train" if b < t_end else ("valid" if b < v_end else "test")
    assert got == exp


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.sampled_from(["en", "fr", "de"])),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 4),
)
def test_stratified_sample_matches_python(spark, rows, k):
    from dask_array_spark.functions import governance as G

    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        r["doc_id"]: r["in_sample"]
        for r in G.stratified_sample_flag(df, "lang", k=k).collect()
    }
    by_lang = defaultdict(list)
    for i, lang in rows:
        by_lang[lang].append((py_polyhash(f"st:{i}"), i))
    exp = {}
    for lang, members in by_lang.items():
        members.sort()
        keep = {i for _, i in members[:k]}
        for _, i in members:
            exp[i] = i in keep
    assert got == exp


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.sampled_from(["en", "fr", "de"])),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    st.sampled_from([{"en": 0.5}, {"en": 0.0, "fr": 1.0}, {"de": 0.25}]),
    st.sampled_from([1.0, 0.75]),
)
def test_mixture_sample_matches_python(spark, rows, weights, default):
    from dask_array_spark.functions import governance as G

    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        r["doc_id"]: r["mix_keep"]
        for r in G.mixture_sample_flag(
            df, weights, "lang", default=default
        ).collect()
    }
    exp = {}
    for i, lang in rows:
        h = (py_polyhash(f"mx:{i}") * A_MIX) % P
        rate = weights.get(lang, default)
        exp[i] = (h % 1_000_000) < rate * 1_000_000.0
    assert got == exp
