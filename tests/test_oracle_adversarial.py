"""Adversarial-corpus oracle gate: the text-family registry queries
and their DuckDB oracles must agree on edge-case documents the
synthetic testdata never contains -- empty text, whitespace-only,
single tokens, one-char docs, pathological repeats, exact duplicates,
and unicode-free extremes.  (The round-5 empty-document clipping bug
slipped through precisely because the driver corpus has no empty
docs; this harness closes that class of gap for every text-grain
slot.)"""

from __future__ import annotations

import math

import duckdb
import pytest

ADVERSARIAL_DOCS = [
    # (doc_id, text, lang, source)
    (0, "", "en", "adv"),
    (1, "   ", "en", "adv"),
    (2, "x", "de", "adv"),
    (3, "a", "en", "adv"),
    (4, "a a a a a a a a a a a a a a a a", "en", "adv"),       # one-token repeat
    (5, "the the the the the the the the", "en", "adv"),      # stopword repeat
    (6, "p q r s t u v w x y z p q r s t u v w x y z", "fr", "adv"),  # period-2 block
    (7, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12", "es", "adv"),
    (8, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12", "es", "adv"),  # exact dup of 7
    (9, "pre w3 w4 w5 w6 w7 w8 w9 w10 post", "zh", "adv"),       # shared infix
    (10, "single-token-with-hyphens-and-123-digits", "en", "adv"),
    (11, "A b C d E f G h I j K l M n O p", "en", "adv"),
    (12, "short", "und", "adv"),
]

# text-grain slots that only read the documents table
QUERIES_UNDER_TEST = [
    "text_suite",
    "tokenize_suite",
    "dedup_exact_groups",
    "dedup_lsh_pairs_verify",
    "dedup_substring_spans",
    "pipeline_clean_corpus",
]


@pytest.fixture(scope="module")
def adv_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("adv")
    spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, t, l, s in ADVERSARIAL_DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def adv_ddb(adv_dir):
    con = duckdb.connect()
    # Spark writes the table as a directory of part files
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{adv_dir}/documents.parquet/*.parquet'"
    )
    return con


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            x = row[i]
            if isinstance(x, bool):
                vals.append(("b", x))
            elif isinstance(x, float):
                vals.append(("f", "nan" if math.isnan(x) else round(x, 9)))
            elif x is None:
                vals.append(("n", None))
            else:
                vals.append(("o", x))
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


@pytest.mark.parametrize("name", QUERIES_UNDER_TEST)
def test_adversarial_corpus_matches_oracle(name, spark, adv_dir, adv_ddb):
    from dask_array_spark import queries as Q

    df = Q.QUERIES[name](spark, adv_dir)
    got = _canon([tuple(r) for r in df.collect()], df.columns)
    res = adv_ddb.execute(Q.ORACLES[name])
    want = _canon(res.fetchall(), [c[0] for c in res.description])
    assert got == want, f"{name}: {len(got)} spark rows vs {len(want)} oracle rows"


ADVERSARIAL_VECS = [
    (0, [1.0, 0.0, 0.0, 0.0], 0),
    (1, [0.0, 1.0, 0.0, 0.0], 0),
    (2, [-1.0, 0.0, 0.0, 0.0], 1),
    (3, [0.5, 0.5, 0.5, 0.5], 1),
    (4, [0.0, 0.0, 0.0, 0.0], 2),      # zero vector (norm 0)
    (5, [1.0, 0.0, 0.0, 0.0], 2),      # exact duplicate of 0
    (6, [1e-8, 0.0, 0.0, 0.0], 0),     # near-zero norm
    (7, [3.0, -4.0, 0.0, 0.0], 1),
]

EMB_QUERIES = ["similarity_suite", "embed_assign_bucket"]


@pytest.fixture(scope="module")
def adv_emb_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("adv_emb")
    spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in ADVERSARIAL_VECS],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "embeddings.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def adv_emb_ddb(adv_emb_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{adv_emb_dir}/embeddings.parquet/*.parquet'"
    )
    return con


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_adversarial_embeddings_match_oracle(name, spark, adv_emb_dir, adv_emb_ddb):
    """Zero-norm and duplicate vectors must not diverge between the
    engine and the oracle (0/0 cosine is NULL in both after the
    rounding projections; ties and probes stay deterministic)."""
    from dask_array_spark import queries as Q

    df = Q.QUERIES[name](spark, adv_emb_dir)
    got = _canon([tuple(r) for r in df.collect()], df.columns)
    res = adv_emb_ddb.execute(Q.ORACLES[name])
    want = _canon(res.fetchall(), [c[0] for c in res.description])
    assert got == want, f"{name}: {len(got)} spark rows vs {len(want)} oracle rows"
