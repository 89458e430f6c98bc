"""Sweep every registered query's physical plan for the round-13 cost
class: a non-cheap higher-order subtree (filter/transform/aggregate/
zip_with/exists over an array) textually repeated >= 2x inside ONE
Project node.  The interpreted projection does not share repeated
subtrees, so each textual repeat is a full re-evaluation per row
(measured ~3x on quality, ~6x on lang_id before changes 3/5/6).

Canonicalizes expression ids (#123) and lambda variable names so that
structurally identical subtrees compare equal.

Run: python forensics/r13_dup_subtree_sweep.py
"""

import re
import sys

sys.path.insert(0, "/root/repo")

from dask_array_spark.session import get_spark
from dask_array_spark import queries as Q

HO = re.compile(r"\b(aggregate|filter|transform|zip_with|exists|array_sort)\(")


def balanced(s: str, start: int) -> str:
    """Extract s[start:] up to the matching close paren of the first
    open paren at/after start."""
    i = s.index("(", start)
    depth = 0
    for j in range(i, len(s)):
        if s[j] == "(":
            depth += 1
        elif s[j] == ")":
            depth -= 1
            if depth == 0:
                return s[start : j + 1]
    return s[start:]


def canon(expr: str) -> str:
    expr = re.sub(r"#\d+[L]?", "#", expr)
    expr = re.sub(r"\blambda [a-z]+_\d+", "lambda v", expr)
    return expr


def project_nodes(plan: str):
    """Yield the Output[...] expression text of each Project detail
    block in an explain('formatted') string."""
    blocks = re.split(r"\n\(\d+\) ", plan)
    for b in blocks:
        if b.startswith("Project") or b.startswith("Window") or b.startswith(
            "HashAggregate"
        ) or b.startswith("SortAggregate") or b.startswith("Filter"):
            yield b


def dup_subtrees(plan: str):
    found = {}
    for node in project_nodes(plan):
        counts = {}
        for m in HO.finditer(node):
            sub = canon(balanced(node, m.start()))
            if len(sub) < 40:  # trivial
                continue
            counts[sub] = counts.get(sub, 0) + 1
        for sub, c in counts.items():
            # keep only maximal duplicated subtrees: skip ones contained
            # in another duplicated subtree with the same count
            if c >= 2:
                found[sub] = max(found.get(sub, 0), c)
    # drop nested duplicates (a repeated inner subtree of a repeated
    # outer one is the same root cause)
    keys = sorted(found, key=len, reverse=True)
    out = []
    for k in keys:
        if any(k in other for other, _ in out):
            continue
        out.append((k, found[k]))
    return out


def main():
    spark = get_spark("dup-sweep", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.01"
    hits = 0
    for name in sorted(Q.QUERIES):
        try:
            df = Q.QUERIES[name](spark, sf)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {str(e)[:100]}")
            continue
        dups = dup_subtrees(plan)
        if dups:
            hits += 1
            print(f"== {name}")
            for sub, c in dups[:6]:
                print(f"   x{c}  {sub[:160]}")
    if not hits:
        print("no duplicated non-cheap subtrees anywhere")


if __name__ == "__main__":
    main()
