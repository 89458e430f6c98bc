"""Derive a 10x (sf1-scale) dataset from the driver's sf0.1 parquet
for the SCALE.md scaling experiment (round-6 verdict ask 5).

Design goal: scaling should measure the ENGINE, not artifacts of naive
duplication, so every copy preserves the base data's per-row
distributions while keeping cross-copy collision DENSITY constant:

- fact keys shift by a per-copy stride (uniqueness + join integrity:
  lineitem.l_orderkey moves with orders.o_orderkey, o_custkey with
  c_custkey, ...); dimension tables (region, nation) stay fixed.
- documents: copy i > 0 suffixes every token with ``~i`` -- token
  hashes differ per copy, so shingle / k-gram / MinHash collisions
  NEVER cross copies and the near-duplicate density (pairs per doc)
  stays exactly the base corpus's.  Verbatim duplication would
  instead grow LSH bucket membership 10x and candidate pairs ~100x --
  a data-density change masquerading as super-linear engine cost.
- embeddings: copy i applies a per-(copy, dim) Rademacher sign flip.
  Within-copy dot products, norms, and cosines are IDENTICAL to the
  base (both vectors flip the same signs), while cross-copy cosines
  decorrelate to pseudo-random -- near-dup pair density per vector is
  preserved, corpus size is 10x.
- events: ids shift, timestamps keep -- each tumbling window holds
  10x events (linear growth per window, the realistic shape).

Output: /root/repo/.scaledata/sf1/*.parquet (gitignored, ~170 MB).
Usage: python make_scale_data.py && SPARK_GRAFT_SF_DIR=$PWD/.scaledata/sf1 python bench.py
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
# SPARK_GRAFT_SCALE_COPIES / SPARK_GRAFT_SCALE_OUT parameterize the
# multiplier and output dir for CLI runs (round 8: used for the
# one-shot 30x point in SCALE.md).  main(copies=, out=) overrides both
# -- bench.py's --sf1 ritual pins copies=10/out='sf1' explicitly so a
# still-exported 30x environment cannot corrupt the sf1 ritual data.


def main(copies: int | None = None, out: str | None = None) -> None:
    COPIES = (
        copies
        if copies is not None
        else int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
    )
    DST = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".scaledata",
        out or os.environ.get("SPARK_GRAFT_SCALE_OUT", "sf1"),
    )
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()

    def src(t):
        return f"'{SRC}/{t}.parquet'"

    stride = {}
    for t, k in [
        ("orders", "o_orderkey"),
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
        ("events", "event_id"),
    ]:
        stride[k] = con.execute(f"SELECT max({k}) + 1 FROM {src(t)}").fetchone()[0]
    stride["user_id"] = con.execute(
        f"SELECT max(user_id) + 1 FROM {src('events')}"
    ).fetchone()[0]

    def emit(table: str, select_for_copy) -> None:
        sql = " UNION ALL ".join(select_for_copy(i) for i in range(COPIES))
        con.execute(
            f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM {src(t)}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    emit(
        "customer",
        lambda i: f"""SELECT c_custkey + {i * stride['c_custkey']} AS c_custkey,
            c_name, c_nationkey, c_acctbal, c_mktsegment FROM {src('customer')}""",
    )
    emit(
        "supplier",
        lambda i: f"""SELECT s_suppkey + {i * stride['s_suppkey']} AS s_suppkey,
            s_name, s_nationkey, s_acctbal FROM {src('supplier')}""",
    )
    emit(
        "part",
        lambda i: f"""SELECT p_partkey + {i * stride['p_partkey']} AS p_partkey,
            p_name, p_brand, p_type, p_size, p_retailprice FROM {src('part')}""",
    )
    emit(
        "orders",
        lambda i: f"""SELECT o_orderkey + {i * stride['o_orderkey']} AS o_orderkey,
            o_custkey + {i * stride['c_custkey']} AS o_custkey,
            o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src('orders')}""",
    )
    emit(
        "lineitem",
        lambda i: f"""SELECT l_orderkey + {i * stride['o_orderkey']} AS l_orderkey,
            l_partkey + {i * stride['p_partkey']} AS l_partkey,
            l_suppkey + {i * stride['s_suppkey']} AS l_suppkey,
            l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
            l_returnflag, l_linestatus, l_shipdate FROM {src('lineitem')}""",
    )
    emit(
        "events",
        lambda i: f"""SELECT event_id + {i * stride['event_id']} AS event_id,
            ts, user_id + {i * stride['user_id']} AS user_id,
            event_type, value, props FROM {src('events')}""",
    )
    emit(
        "documents",
        lambda i: (
            f"""SELECT doc_id + {i * stride['doc_id']} AS doc_id,
            text, lang, source, n_chars FROM {src('documents')}"""
            if i == 0
            else f"""SELECT doc_id + {i * stride['doc_id']} AS doc_id,
            array_to_string(list_transform(
                list_filter(string_split(text, ' '), x -> x != ''),
                t -> t || '~{i}'), ' ') AS text,
            lang, source, n_chars FROM {src('documents')}"""
        ),
    )
    emit(
        "embeddings",
        lambda i: (
            f"""SELECT vec_id + {i * stride['vec_id']} AS vec_id,
            embedding, label FROM {src('embeddings')}"""
            if i == 0
            else f"""SELECT vec_id + {i * stride['vec_id']} AS vec_id,
            CAST(list_transform(range(1, len(embedding) + 1),
                j -> embedding[j] * (CASE WHEN hash({i} * 1000 + j) % 2 = 0
                                     THEN 1 ELSE -1 END)) AS FLOAT[]) AS embedding,
            label FROM {src('embeddings')}"""
        ),
    )
    # sf1v: the TEXT-DISTRIBUTION control.  The '~i' token suffix above
    # keeps cross-copy shingle/k-gram collision density constant (what
    # the DEDUP slots need) but shifts per-row token statistics
    # (stopword ratio drops to ~0 for copies i>0, token length +2) and
    # grows the distinct-gram vocabulary ~10x linearly (a real corpus
    # saturates per Heaps' law), inflating the vocab-sized bigram-LM
    # model side.  Text-tier slots (text_quality) are therefore ALSO
    # measured on this verbatim-copy variant, which preserves per-row
    # text statistics and the vocabulary EXACTLY (and is safe for
    # per-document operators, which never join across documents).
    dstv = DST + "v"
    os.makedirs(dstv, exist_ok=True)
    sqlv = " UNION ALL ".join(
        f"""SELECT doc_id + {i * stride['doc_id']} AS doc_id,
            text, lang, source, n_chars FROM {src('documents')}"""
        for i in range(COPIES)
    )
    con.execute(f"COPY ({sqlv}) TO '{dstv}/documents.parquet' (FORMAT PARQUET)")
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        # re-link unconditionally: a re-run rewrites the base sf1
        # parquet to NEW inodes, so a kept link would silently pin the
        # previous generation and desync sf1v from sf1
        lnk = os.path.join(dstv, f"{t}.parquet")
        if os.path.exists(lnk):
            os.remove(lnk)
        os.link(os.path.join(DST, f"{t}.parquet"), lnk)
    print("sf1v (verbatim documents):", dstv)
    print("done ->", DST)


if __name__ == "__main__":
    main()
