"""Property-based fuzz of the ExactSubstr span chain
(kgram_positions -> duplicated_spans -> clip_duplicated_spans,
functions/dedup.py) against an independent plain-Python model that
matches token tuples directly (no hashing) and merges runs/intervals
with lists -- implementation diversity over the DuckDB oracle, input
diversity over the fixed driver corpora.

Corpora are built to actually share substrings: derived documents
splice a verbatim slice of a base document into a random position.
"""

from __future__ import annotations

from collections import defaultdict

import pytest
from hypothesis import given, settings, strategies as st

K = 3  # gram size; min span length = K


# ----------------------------------------------------- python model
def _toks(text):
    return [t for t in text.split(" ") if t]


def py_spans(texts, k=K, max_positions=None):
    toks = {i: _toks(t) for i, t in enumerate(texts)}
    grams = {
        i: [tuple(ts[p : p + k]) for p in range(len(ts) - k + 1)]
        for i, ts in toks.items()
        if len(ts) >= k
    }
    if max_positions is not None:
        counts = defaultdict(int)
        for gs in grams.values():
            for g in gs:
                counts[g] += 1
        keep = {g for g, n in counts.items() if n <= max_positions}
    spans = set()
    ids = sorted(grams)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            by_diag = defaultdict(list)
            for pa, ga in enumerate(grams[a]):
                if max_positions is not None and ga not in keep:
                    continue
                for pb, gb in enumerate(grams[b]):
                    if ga == gb:
                        if max_positions is not None and gb not in keep:
                            continue
                        by_diag[pa - pb].append(pa)
            for d, pas in by_diag.items():
                pas.sort()
                runs, run = [], [pas[0]]
                for p in pas[1:]:
                    if p == run[-1] + 1:
                        run.append(p)
                    else:
                        runs.append(run)
                        run = [p]
                runs.append(run)
                for r in runs:
                    length = len(r) + k - 1
                    if length >= k:
                        spans.add((a, b, r[0], r[0] - d, length))
    return spans


def py_clip(texts, spans):
    ivs = defaultdict(list)
    for (_, b, _, bs, ln) in spans:
        ivs[b].append((bs, bs + ln))
    out = {}
    for i, t in enumerate(texts):
        ts = _toks(t)
        merged = []
        for s, e in sorted(ivs.get(i, [])):
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        kept = [
            tok
            for j, tok in enumerate(ts)
            if not any(s <= j < e for s, e in merged)
        ]
        out[i] = (" ".join(kept), len(kept), len(ts) - len(kept))
    return out


# ------------------------------------------------------- strategies
WORDS = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]
DOC = st.lists(st.sampled_from(WORDS), min_size=K, max_size=12)


@st.composite
def corpora(draw):
    base = draw(st.lists(DOC, min_size=2, max_size=4))
    docs = [list(d) for d in base]
    for _ in range(draw(st.integers(1, 3))):
        src = draw(st.sampled_from(docs))
        lo = draw(st.integers(0, max(0, len(src) - K)))
        hi = draw(st.integers(min(lo + K, len(src)), len(src)))
        host = list(draw(st.sampled_from(docs)))
        at = draw(st.integers(0, len(host)))
        docs.append(host[:at] + src[lo:hi] + host[at:])
    return [" ".join(d) for d in docs]


def _spans_set(df):
    return {
        (r["doc_a"], r["doc_b"], r["a_start"], r["b_start"], r["length"])
        for r in df.collect()
    }


@settings(max_examples=4, deadline=None)
@given(corpora())
def test_duplicated_spans_matches_python(spark, texts):
    from dask_array_spark.functions import dedup as D

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = _spans_set(
        D.duplicated_spans(df, k=K, min_tokens=K, max_positions=None)
    )
    assert got == py_spans(texts)
    # verify=True only removes hash-collision artifacts, absent here
    got_v = _spans_set(
        D.duplicated_spans(
            df, k=K, min_tokens=K, max_positions=None, verify=True
        )
    )
    assert got_v == got


@settings(max_examples=4, deadline=None)
@given(corpora(), st.integers(2, 5))
def test_hot_gram_cap_matches_python(spark, texts, cap):
    from dask_array_spark.functions import dedup as D

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = _spans_set(
        D.duplicated_spans(df, k=K, min_tokens=K, max_positions=cap)
    )
    assert got == py_spans(texts, max_positions=cap)


@settings(max_examples=4, deadline=None)
@given(corpora())
def test_clip_matches_python(spark, texts):
    from dask_array_spark.functions import dedup as D

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    spans = D.duplicated_spans(df, k=K, min_tokens=K, max_positions=None)
    got = {
        r["doc_id"]: (r["text"], r["n_tokens_kept"], r["n_tokens_removed"])
        for r in D.clip_duplicated_spans(df, spans).collect()
    }
    assert got == py_clip(texts, py_spans(texts))
