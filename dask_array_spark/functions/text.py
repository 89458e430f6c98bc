"""Text analysis operators for training-data pipelines (additive scope
beyond the reference, SURVEY.md section 7 M6): token statistics,
quality scoring, language-ID heuristic, document fingerprinting.

All JVM-side Catalyst expressions (split / higher-order functions) --
no Python UDFs in the hot path; every op is a per-row projection or a
groupBy, so they scale linearly and shuffle only on aggregation keys.

Determinism: token hashing uses an explicit polynomial rolling hash
(h = (h*31 + ascii(c)) mod 1e9+7) rather than engine-specific hash(),
so a SQL oracle reproduces results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tokens_col",
    "polyhash_col",
    "token_stats",
    "quality_col",
    "quality_score",
    "lang_id",
    "fingerprint",
    "token_count",
    "repetition_stats",
    "repetition_cols",
    "token_stats_cols",
    "lang_id_col",
    "bigram_lm_scores",
    "mixed_hash_col",
    "perplexity_buckets",
    "tfidf_keywords",
]

P = 1_000_000_007
SEED = 7

# tiny function-word marker lists for the lang-ID heuristic
LANG_MARKERS = {
    "en": ["the", "a", "of", "and"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "la", "y", "los"],
    "de": ["der", "die", "und", "das"],
    "zh": ["de", "shi", "he", "zai"],
}
STOPWORDS = ["a", "the", "and", "of"]


def tokens_col(text: Column | str) -> Column:
    """Whitespace tokenization (single-space corpus).

    SQL-fragment twin: ``tokens_sql`` below -- any semantic edit here
    MUST be mirrored there (one test-pinned definition pair; the
    fast-path constructors in functions/dedup.py build from the SQL
    fragments)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, " "), lambda x: x != "")


def sql_ident(name: str) -> str:
    """Backtick-quote a TOP-LEVEL column name for embedding in an
    ``F.expr`` string.  Single-part identifier semantics: a dotted
    name stays one column (matching ``F.col`` would instead resolve
    multipart struct fields -- callers passing such names must use the
    Column-API paths)."""
    return "`" + name.replace("`", "``") + "`"


def tokens_sql(text_expr: str) -> str:
    """``tokens_col`` as a SQL fragment (``text_expr`` is an already-
    quoted identifier or a SQL expression).  Same Catalyst tree as the
    Column form modulo lambda-variable naming -- the single-parse
    constructor device of optimization rounds 13/14 (a Column-API
    build of these folds costs hundreds of py4j round-trips of DRIVER
    time per query construction; one ``F.expr`` parse is sub-ms)."""
    return f"filter(split({text_expr}, ' '), x -> x != '')"


def polyhash_sql(s_expr: str) -> str:
    """``polyhash_col`` (no ``finish``) as a SQL fragment over the
    string-valued SQL expression ``s_expr``.  Mirrors the Column form
    EXACTLY: same SEED/31/P literals and cast placement."""
    return (
        f"aggregate(filter(split({s_expr}, ''), x -> x != ''), "
        f"CAST({SEED} AS BIGINT), (acc, x) -> (acc * 31 + ascii(x)) % {P})"
    )


TOKS = "__toks"


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize the token array ONCE in a lower projection (column
    ``__toks``).  The composite text expressions below reference the
    token array many times; higher-order functions fall out of
    whole-stage codegen and the interpreted projection does NOT share
    the repeated split+filter subtrees (measured: the 6-reference
    quality projection runs ~3x slower than the same expression over a
    materialized array -- optimization round 13).  CollapseProject
    keeps the two projections separate exactly because the alias is
    non-cheap and multiply referenced, so each document tokenizes once
    regardless of how many signals a suite composes.  Consumers that
    reference the array only once collapse back to a single projection
    -- identical to the historical plan."""
    return df.withColumn(TOKS, tokens_col(text_col))


def _toks_or(text_col: str, toks: Column | None) -> Column:
    return tokens_col(text_col) if toks is None else toks


def polyhash_col(s: Column, finish=None) -> Column:
    """Deterministic polynomial rolling hash over characters
    (document fingerprinting; cross-engine reproducible).

    SQL-fragment twin: ``polyhash_sql`` above -- any semantic edit
    here MUST be mirrored there (the single-parse fast paths in
    functions/dedup.py build from that fragment; parity is pinned by
    the expr-vs-Column tests).

    ``finish``: optional lambda applied to the final accumulator
    INSIDE the aggregate (optimization round 13).  A caller that
    branches on the hash (e.g. ``split_col``'s CaseWhen over the
    bucket) would otherwise embed the whole per-char fold once per
    branch -- the interpreted projection does not share repeated
    higher-order subtrees -- so the decision folds into the
    aggregate's finish step and the string hashes exactly once."""
    chars = F.filter(F.split(s, ""), lambda x: x != "")
    init = F.lit(SEED).cast("long")
    merge = lambda acc, x: (acc * 31 + F.ascii(x)) % F.lit(P)  # noqa: E731
    if finish is None:
        return F.aggregate(chars, init, merge)
    return F.aggregate(chars, init, merge, finish)


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.select(
        "doc_id", F.size(tokens_col(text_col)).cast("long").alias("n_tokens")
    )


def token_stats_cols(
    text_col: str = "text", toks: Column | None = None
) -> list[Column]:
    """Token statistics as standalone aliased Columns (single-
    projection suites and streams compose them join-free).  Pass a
    materialized ``toks`` column (see ``with_tokens``) so the token
    array is computed once per document instead of once per reference
    -- the interpreted projection does not share the repeated
    higher-order subtrees."""
    toks = _toks_or(text_col, toks)
    n = F.size(toks).cast("double")
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    distinct_n = F.size(F.array_distinct(toks)).cast("double")
    stop_n = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("double")

    def ratio(x):
        # explicit zero-token contract: every ratio is 0.0 (not the
        # engine-specific NULL/NaN a 0/0 division would give -- Spark
        # non-ANSI yields NULL where DuckDB yields NaN, an oracle
        # divergence the adversarial-corpus gate caught)
        return F.when(n > 0, F.round(x / n, 6)).otherwise(F.lit(0.0))

    return [
        F.length(text_col).cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        ratio(total_len).alias("avg_token_len"),
        ratio(distinct_n).alias("distinct_ratio"),
        ratio(stop_n).alias("stopword_ratio"),
    ]


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token statistics: counts, mean token length,
    distinct-token ratio, stopword ratio.  Tokenizes once per document
    (``with_tokens``)."""
    base = with_tokens(df.select("doc_id", text_col), text_col)
    return base.select(
        "doc_id", *token_stats_cols(text_col, toks=F.col(TOKS))
    )


def quality_col(text_col: str = "text", toks: Column | None = None) -> Column:
    """The quality score as a standalone Column expression (streaming
    pipelines compose it into one join-free projection).  Pass a
    materialized ``toks`` column (``with_tokens``) to tokenize once
    per document -- measured ~3x on this projection alone."""
    toks = _toks_or(text_col, toks)

    # bind the token array ONCE via a higher-order lambda (optimization
    # round 13): the score references the array 6x, and when Catalyst
    # pushes a filter on the quality column below the tokenize-once
    # projection it INLINES the alias into every reference -- the
    # pipeline_clean_corpus quality gate was re-tokenizing every
    # document 6x inside the pushed Filter.  With the array bound to a
    # lambda variable, any inlining carries exactly one tokenization;
    # lambda-variable references are reads of the already-evaluated
    # value.  Values are identical (same expression over the same
    # array; a NULL token array still yields 0.0 through the n>0 gate).
    def q(t: Column) -> Column:
        n = F.size(t).cast("double")
        length_term = F.least(F.size(t).cast("double") / F.lit(100.0), F.lit(1.0))
        diversity = F.size(F.array_distinct(t)).cast("double") / n
        stop_pen = (
            F.size(F.filter(t, lambda w: w.isin(STOPWORDS))).cast("double")
            / n
            * 0.5
        )
        return F.when(
            n > 0,
            F.round(
                F.greatest(
                    F.lit(0.0),
                    F.least(
                        F.lit(1.0), length_term * 0.4 + diversity * 0.6 - stop_pen
                    ),
                ),
                6,
            ),
        ).otherwise(F.lit(0.0))

    return F.transform(F.array(toks), q)[0]


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: length band + lexical
    diversity - stopword saturation (heuristic; the plumbing is the
    point -- a per-row projection that scales to any corpus).
    Computed from RAW ratios (not the 6-decimal-rounded stats) so the
    only rounding step is the final one.  Tokenizes once per document
    (``with_tokens`` -- measured ~3x on this projection)."""
    base = with_tokens(df.select("doc_id", text_col), text_col)
    return base.select(
        "doc_id", quality_col(text_col, toks=F.col(TOKS)).alias("quality")
    )


def _lang_id_expr(text_col: str, toks: str | None) -> Column:
    """lang_id_col's expression as ONE SQL parse (optimization round
    14, same single-parse device as functions/dedup._simhash_expr):
    the string spells exactly the Column branch's tree -- same struct
    shapes, same -2 init, same strict-> fold and ==0 'und' finish --
    from the shared tokens_sql fragment."""
    toks_sql_ = tokens_sql(sql_ident(text_col)) if toks is None else sql_ident(toks)
    entries = ", ".join(
        "struct(size(filter({t}, t -> t IN ({m}))) AS s, '{lang}' AS l)".format(
            t=toks_sql_,
            m=", ".join("'" + w.replace("'", "''") + "'" for w in markers),
            lang=lang,
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    )
    return F.expr(
        f"aggregate(array({entries}), struct(-2 AS s, 'und' AS l), "
        "(acc, x) -> CASE WHEN x.s > acc.s THEN x ELSE acc END, "
        "acc -> CASE WHEN acc.s = 0 THEN 'und' ELSE acc.l END)"
    )


def lang_id_col(
    text_col: str = "text", toks: "Column | str | None" = None
) -> Column:
    """Predicted language as a standalone Column (marker-token scores
    with deterministic alphabetical tie-break).  ``toks``: see
    ``with_tokens`` -- each language's marker scan runs once per
    document: the scores evaluate ONCE into an in-row (score, lang)
    struct array and a fold picks the argmax (optimization round 13:
    the former greatest(*scores) + per-language CaseWhen chain
    re-embedded every filter scan, so the interpreted projection --
    higher-order functions fall out of codegen and repeated subtrees
    are not shared -- evaluated the 5 marker scans ~3-6x per document).
    Tie-break is identical: strict > keeps the FIRST struct, and the
    array is built in sorted(lang) order, so the alphabetically
    smallest max-score language wins; a 0 best score stays 'und'.

    When ``text_col``/``toks`` are NAMES the identical tree builds as
    ONE F.expr parse (optimization round 14; the Column-API loop was
    ~70 py4j round-trips of driver time per construction) -- pass the
    column NAME to keep the fast path; a Column is still accepted
    (legacy constructor below, same values, pinned by test)."""
    if (
        isinstance(text_col, str)
        and (toks is None or isinstance(toks, str))
        # dotted names resolve as MULTIPART struct-field references
        # through F.col but as a single quoted identifier through the
        # expr fast path (round-13 ADVICE): route them to the legacy
        # Column branch so both spellings keep F.col semantics
        and "." not in text_col
        and (toks is None or "." not in toks)
    ):
        return _lang_id_expr(text_col, toks)
    toks = _toks_or(text_col, toks)

    def marker_filter(m):
        # single-parameter closure: a 2-arg lambda would be treated by
        # F.filter as the (element, index) form and shadow the binding
        return lambda t: t.isin(m)

    entries = F.array(
        *[
            F.struct(
                F.size(F.filter(toks, marker_filter(m))).alias("s"),
                F.lit(lang).alias("l"),
            )
            for lang, m in sorted(LANG_MARKERS.items())
        ]
    )
    return F.aggregate(
        entries,
        # init below every possible score: size() of a NULL token
        # array is -1 (legacy sizeOfNull), so -2 makes the first
        # (alphabetically smallest) language win the fold exactly like
        # the old outermost CaseWhen branch did -- including the NULL-
        # text case, where the old chain returned the first language
        # because best==-1 fails the ==0 'und' gate
        F.struct(F.lit(-2).alias("s"), F.lit("und").alias("l")),
        lambda acc, x: F.when(x["s"] > acc["s"], x).otherwise(acc),
        # 'und' iff the best score is exactly 0 -- the old chain's rule
        lambda acc: F.when(acc["s"] == 0, F.lit("und")).otherwise(acc["l"]),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language scoring with deterministic alphabetical
    tie-break -- n-gram/function-word heuristic shaped like a real
    langid pass (per-row, no shuffle).  Tokenizes once per document
    (``with_tokens``)."""
    base = with_tokens(df.select("doc_id", text_col), text_col)
    return base.select(
        "doc_id", lang_id_col(text_col, toks=TOKS).alias("pred_lang")
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.select("doc_id", polyhash_col(F.col(text_col)).alias("fp"))


def _ngram_strings(toks: Column, n: int) -> Column:
    """Word n-grams as space-joined strings; empty array below n
    tokens (guarded -- Spark's sequence(1, 0) would count DOWN)."""
    size = F.size(toks)
    idx = F.when(size >= n, F.sequence(F.lit(1), size - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(k)) for k in range(n)]
        ),
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, appendix A1.1)
    adapted to a newline-free corpus:

    - ``top2gram_char_frac`` -- fraction of the document's characters
      covered by its most frequent word bigram (count x len(bigram) /
      n_chars; ties broken toward the lexicographically smallest
      bigram).
    - ``dup3gram_frac`` -- fraction of word trigrams that are repeats
      of an earlier trigram (1 - distinct/total).
    - ``max_token_run`` -- longest run of one token repeated
      consecutively.

    Machine-generated and boilerplate text scores high on all three;
    real pipelines drop documents above thresholds.  Pure per-row
    Catalyst projections (sort + fold over in-row arrays): zero
    shuffles, linear in corpus size.  The in-row mode computation
    (sorted-array run fold) replaces the groupBy a naive per-ngram
    count would need -- at 100 TB that groupBy would shuffle ~n_tokens
    rows per document.

    Tokenizes once per document and materializes the trigram array
    once (``with_tokens`` + a ``__tg3`` projection): the dup3gram
    signal references the trigram array three times and the
    interpreted projection does not share repeated higher-order
    subtrees (optimization round 13)."""
    base = with_tokens(df.select("doc_id", text_col), text_col)
    base = base.withColumn("__tg3", _ngram_strings(F.col(TOKS), 3))
    return base.select(
        "doc_id",
        *repetition_cols(text_col, toks=F.col(TOKS), tg3=F.col("__tg3")),
    )


def repetition_cols(
    text_col: str = "text",
    toks: Column | None = None,
    tg3: Column | None = None,
) -> list[Column]:
    """The repetition signals as standalone aliased Columns (single-
    projection suites compose them join-free).  ``toks``/``tg3``: see
    ``with_tokens`` / ``repetition_stats`` -- pass materialized token
    and trigram arrays so neither is rebuilt per reference."""
    toks = _toks_or(text_col, toks)
    nc = F.length(text_col).cast("double")
    # most-frequent bigram: sort the in-row bigram array, then a fold
    # tracks the current and best run (strict > keeps the first = the
    # lexicographically smallest max-count bigram)
    sorted_bg = F.array_sort(_ngram_strings(toks, 2))
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit("").alias("prev"), zero.alias("run"),
        zero.alias("best"), F.lit("").alias("bestg"),
    )

    def step(acc, x):
        newrun = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            newrun.alias("run"),
            F.when(newrun > acc["best"], newrun).otherwise(acc["best"]).alias("best"),
            F.when(newrun > acc["best"], x).otherwise(acc["bestg"]).alias("bestg"),
        )

    # the finish lambda collapses the fold to its final scalar so the
    # aggregate is REFERENCED once -- the former top["best"] /
    # top["bestg"] pair duplicated the entire fold expression per
    # field access (optimization round 13; same chars-covered value)
    top_chars = F.aggregate(
        sorted_bg,
        init,
        step,
        lambda acc: acc["best"].cast("double") * F.length(acc["bestg"]),
    )
    # empty-text guard: Spark's non-ANSI x/0 yields NULL while DuckDB's
    # IEEE division yields NaN -- pin 0.0 like dup3gram_frac does
    top_frac = F.when(
        nc > 0,
        F.round(top_chars / nc, 6),
    ).otherwise(F.lit(0.0))

    tg = _ngram_strings(toks, 3) if tg3 is None else tg3
    m = F.size(tg).cast("double")
    dup3 = F.when(
        m > 0, F.round((m - F.size(F.array_distinct(tg)).cast("double")) / m, 6)
    ).otherwise(F.lit(0.0))

    run_init = F.struct(F.lit("").alias("prev"), zero.alias("run"), zero.alias("best"))

    def run_step(acc, x):
        newrun = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            newrun.alias("run"),
            F.greatest(newrun, acc["best"]).alias("best"),
        )

    max_run = F.aggregate(toks, run_init, run_step)["best"]

    return [
        top_frac.alias("top2gram_char_frac"),
        dup3.alias("dup3gram_frac"),
        max_run.cast("long").alias("max_token_run"),
    ]


M_BI = 1_000_003  # bigram combine multiplier (same as dedup.M_COMB)


def bigram_lm_scores(
    df: DataFrame,
    ref: DataFrame | None = None,
    min_count: int = 2,
    text_col: str = "text",
    broadcast_rows: int | None = 2_000_000,
) -> DataFrame:
    """CCNet-style n-gram language-model quality score: mean
    bits-per-bigram -log2 P(w_i | w_{i-1}) under an add-one-smoothed
    bigram model counted over ``ref`` (default: the corpus itself).
    Low bits = fluent/common phrasing, high bits = noise -- the
    perplexity-bucket filter of Wenzek et al. 2020 (CCNet), with the
    explicit polynomial token hashes standing in for the external
    KenLM model so an SQL oracle replays it bit-for-bit.

    Returns (doc_id, n_lm_bigrams, lm_bits) for documents with >= 2
    tokens; callers left-join on the document grain (absent = too
    short to score).  ``min_count`` prunes the bigram table the way
    production LMs prune rare n-grams: a dropped bigram backs off to
    pure add-one smoothing, shrinking the model table without touching
    the common mass.

    Scale shape (the 100 TB story): the model side (unigram + pruned
    bigram counts) is VOCAB-sized, not corpus-sized, built with two
    partial-aggregated explode+groupBy passes over the reference.  By
    default the model tables are persisted and counted (two
    vocab-sized scalar actions) and, when under ``broadcast_rows``,
    BROADCAST into the scoring joins -- each document's grams then
    probe a hash map map-side, so the corpus is never shuffled and the
    Zipf-head gram keys ("the ..." bigrams) cannot pile onto one
    sort-merge reducer.  The hashed-token projection of a self-scored
    corpus is computed ONCE (persisted at its fan-out into unigram /
    bigram counts and the scoring side); the returned plan pins that
    cache entry and the two model tables (see the functions-tier
    persist policy note in functions/__init__.py).  Above the gate, or
    with ``broadcast_rows=None``, the joins fall back to the fully
    lazy shuffle form (no persists, no driver actions) -- the vocab
    size then rides along as a one-row crossJoin instead of a
    literal."""
    if ref is None:
        ref = df
    self_ref = ref is df
    P_ = F.lit(P)

    def th_col(d):
        return d.select(
            "doc_id",
            F.transform(tokens_col(text_col), lambda t: polyhash_col(t)).alias(
                "__th"
            ),
        )

    def bigrams_of(th):
        dd = th.filter(F.size("__th") >= 2)
        idx = F.sequence(F.lit(1), F.size("__th") - 1)
        pair = F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(F.col("__th"), i).alias("ph"),
                (
                    (F.element_at(F.col("__th"), i) * M_BI
                     + F.element_at(F.col("__th"), i + F.lit(1))) % P_
                ).alias("bh"),
            ),
        )
        return dd.select("doc_id", F.explode(pair).alias("s")).select(
            "doc_id", F.col("s.ph").alias("ph"), F.col("s.bh").alias("bh")
        )

    def model_tables(th_ref):
        runi = (
            th_ref.select(F.explode("__th").alias("ph"))
            .groupBy("ph")
            .agg(F.count(F.lit(1)).alias("cu"))
        )
        rbi = (
            bigrams_of(th_ref)
            .groupBy("bh")
            .agg(F.count(F.lit(1)).alias("cb"))
            .filter(F.col("cb") >= min_count)
        )
        return runi, rbi

    def score(grams, runi, rbi, v_col):
        bits = -F.log2(
            (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(1)).cast("double")
            / (F.coalesce(F.col("cu"), F.lit(0)) + v_col).cast("double")
        )
        return grams.join(runi, on="ph", how="left").join(
            rbi, on="bh", how="left"
        ), bits

    if broadcast_rows is None:
        # fully lazy legacy shape: sort-merge model joins, vocab size
        # as a one-row crossJoin
        runi, rbi = model_tables(th_col(ref))
        vocab = runi.agg(F.count(F.lit(1)).alias("__v"))
        joined, bits = score(bigrams_of(th_col(df)), runi, rbi, F.col("__v"))
        joined = joined.crossJoin(F.broadcast(vocab))
    else:
        th_ref = th_col(ref).persist()
        runi, rbi = model_tables(th_ref)
        runi, rbi = runi.persist(), rbi.persist()
        nv, nb = runi.count(), rbi.count()
        if not self_ref:
            # both consumers (the model counts) are materialized; the
            # scoring side re-derives from df, so the ref projection
            # cache is dead weight past this point
            th_ref.unpersist()
        runi_j = F.broadcast(runi) if nv <= broadcast_rows else runi
        rbi_j = F.broadcast(rbi) if nb <= broadcast_rows else rbi
        grams = bigrams_of(th_ref if self_ref else th_col(df))
        joined, bits = score(grams, runi_j, rbi_j, F.lit(nv))
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lm_bigrams"),
        (F.round(F.avg(bits), 6) + F.lit(0.0)).alias("lm_bits"),
    )


# affine mixing multiplier (Knuth's 2^32 golden-ratio constant): the
# rolling polyhash is near-monotone in a string's trailing characters
# (the last char contributes +-1 steps), so any DIRECT use of its
# low-order residues -- h % n_shards, h % 1e6 rate gates -- inherits
# source ordering instead of looking uniform.  One multiply-mod wraps
# the hash space and decorrelates residues; products stay < 2^63
# (h < 1e9+7, multiplier < 2^32).
A_MIX = 2_654_435_761


def mixed_hash_col(s: Column) -> Column:
    """polyhash followed by the affine mixing step -- use this (never
    raw polyhash_col) whenever low-order residues of the hash drive a
    decision: shard assignment, rate gates, reservoir positions."""
    return (polyhash_col(s) * F.lit(A_MIX).cast("long")) % F.lit(P)


def perplexity_buckets(
    lm: DataFrame,
    qs: tuple[float, ...] = (1.0 / 3.0, 2.0 / 3.0),
    score_col: str = "lm_bits",
) -> DataFrame:
    """CCNet's perplexity-bucket assignment (Wenzek et al. 2020):
    split scored documents into head / middle / tail by corpus-wide
    quantiles of the LM score (low bits = fluent = head).  ``lm`` is
    the (doc_id, n_lm_bigrams, lm_bits) output of
    ``bigram_lm_scores``; returns (doc_id, ppl_bucket) with buckets
    'head', 'middle', 'tail' (generally: bucket ``i`` of
    ``len(qs)+1``, labeled b0..bn for other cut lists).

    Cuts are DISCRETE (type-1) quantiles -- the smallest score whose
    cumulative count reaches ceil(q * n) -- so there is no float
    interpolation and an SQL oracle replays the boundary decisions
    bit-for-bit on the 6-decimal-rounded scores.

    Scale shape: scores first collapse to a (value, count) table (one
    partial-aggregated shuffle).  Distinct 6-decimal score values are
    ~corpus-sized in practice (lm_bits is a per-doc mean), so the
    running total is computed WITHOUT any global single-task window:
    values coarse-bin by floor(score*100) (monotone, so (bin, score)
    order == score order), the within-bin cumulative runs as a window
    PARTITIONED by bin (distributed across executors), and the
    bin-start offsets come from one window over the tiny per-bin
    totals table (rows bounded by 100x the score range, ~4k for
    lm_bits).  Full cumulative = offset + within-bin -- identical to
    the single-window result, with no corpus-sized sort through one
    task.  The cut rows are a len(qs)-row broadcast crossJoin.

    ``lm`` is scanned several times (the count, the value table, the
    final assignment); it is persisted here if the caller has not
    already cached it, and the returned plan pins that entry (see the
    functions-tier persist policy note in functions/__init__.py)."""
    from pyspark.sql.window import Window
    from pyspark.storagelevel import StorageLevel

    if lm.storageLevel == StorageLevel.NONE:
        lm = lm.persist()
    n = lm.count()  # scalar action; documented driver-side bound
    sc = F.col(score_col)
    counts = lm.groupBy(score_col).agg(F.count(F.lit(1)).alias("__c")).withColumn(
        "__bin", F.floor(sc * 100).cast("long")
    )
    w_in = (
        Window.partitionBy("__bin")
        .orderBy(sc.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_bins = (
        Window.orderBy(F.col("__bin").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    boff = (
        counts.groupBy("__bin")
        .agg(F.sum("__c").alias("__bc"))
        .withColumn("__boff", F.sum("__bc").over(w_bins) - F.col("__bc"))
        .select("__bin", "__boff")
    )
    cum = (
        counts.withColumn("__cumin", F.sum("__c").over(w_in))
        .join(F.broadcast(boff), on="__bin")
        .withColumn("__cum", F.col("__boff") + F.col("__cumin"))
    ).persist()
    labels = (
        ["head", "middle", "tail"] if len(qs) == 2
        else [f"b{i}" for i in range(len(qs) + 1)]
    )
    import math as _math

    cuts = None
    for i, q in enumerate(qs):
        need = _math.ceil(q * n)
        c = cum.filter(F.col("__cum") >= need).agg(
            F.min(score_col).alias(f"__cut{i}")
        )
        cuts = c if cuts is None else cuts.crossJoin(c)
    bucket = F.lit(labels[-1])
    for i in range(len(qs) - 1, -1, -1):
        bucket = F.when(
            F.col(score_col) <= F.col(f"__cut{i}"), F.lit(labels[i])
        ).otherwise(bucket)
    return lm.crossJoin(F.broadcast(cuts)).select(
        "doc_id", bucket.alias("ppl_bucket")
    )


def tfidf_keywords(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Per-document keyword extraction: the top ``k`` tokens by
    TF-IDF (tf = in-doc count, idf = ln((N+1)/(df+1)) + 1 with N =
    corpus size and df = documents containing the token -- the
    smoothed scikit-learn formulation).  Returns (doc_id, rank,
    token, tfidf) with rank 1 = strongest; ties break toward the
    lexicographically smaller token.  Scores round to 6 decimals
    BEFORE ranking so an SQL oracle replays the order bit-for-bit.

    Scale shape: term counts are one explode + partial-aggregated
    groupBy(doc, token); document frequencies aggregate the SAME
    table again by token (vocab-sized result, no second corpus
    pass); N joins as a one-row broadcast crossJoin; the final
    per-doc top-k is a rank window partitioned by doc_id -- no
    global sort, no corpus-sized broadcast.

    The term-count table persists at its fan-out (tf scores + document
    frequencies) and the returned plan pins that cache entry -- see
    the persist policy note in functions/__init__.py."""
    from pyspark.sql.window import Window

    tf = (
        df.select("doc_id", F.explode(tokens_col(text_col)).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("__tf"))
    ).persist()
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("__df"))
    n = df.agg(F.count(F.lit(1)).alias("__n"))
    idf = F.log((F.col("__n") + 1).cast("double") / (F.col("__df") + 1)) + 1
    scored = (
        tf.join(dfreq, on="token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            (F.round(F.col("__tf") * idf, 6) + F.lit(0.0)).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", F.col("rank").cast("long"), "token", "tfidf")
    )
