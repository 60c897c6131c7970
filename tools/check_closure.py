#!/usr/bin/env python3
"""Independent check of the closure-family queries (x14/x31/x39) at scale
factors where DuckDB's transitive-closure oracle becomes infeasible.

The recursive `reach` CTE in the x14/x31 oracles materializes the full
transitive closure — fine at sf0.01 (the driver's gate), but at sf0.1 it
grows to tens of GB and hours in DuckDB and can die with a resource
exception even when the engine's answer is right. This script re-derives
the expected answers from first principles instead:

  - components via union-find over the ORACLE-PASSED x03 pair list
    (so the edge set itself is already cross-engine verified),
  - x31 winners by (whitespace-token count desc, doc_id) within each
    component,
  - x39 by replaying the documented fixed-point integer PageRank
    (rank' = base + (dp * (dangling//N + sum(rank//deg))) // 100)
    in exact Python integers.

Usage: python3 tools/check_closure.py <sfDir> <verifyOutDir>
Exit 0 iff all three queries match exactly.
"""
import sys

import duckdb


def main(sf_dir, out_dir):
    con = duckdb.connect()
    edges = con.execute(
        f"SELECT d1, d2 FROM read_parquet('{out_dir}/x03_ngram_pairs/*.parquet')").fetchall()
    docs = [r[0] for r in con.execute(
        f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')").fetchall()]

    parent = {d: d for d in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    comp = {}
    for d in docs:
        comp.setdefault(find(d), []).append(d)
    expected_label = {}
    for members in comp.values():
        m = min(members)
        for d in members:
            expected_label[d] = m

    fails = 0

    # x14: component min-label per doc
    x14 = dict(con.execute(
        f"SELECT doc_id, cluster_id FROM read_parquet('{out_dir}/x14_dup_clusters/*.parquet')").fetchall())
    bad = [(d, x14.get(d), expected_label[d])
           for d in docs if x14.get(d) != expected_label[d]]
    print(f"{'FAIL' if bad else 'PASS'} x14_dup_clusters "
          f"({len(docs)} docs, {len(comp)} components)"
          + (f": {bad[:3]}" if bad else ""))
    fails += bool(bad)

    # x31: best (ws-tokens desc, doc_id) member + member count per cluster
    toks = dict(con.execute(
        "SELECT doc_id, len(list_filter(string_split(text, ' '), x -> x <> ''))"
        f" FROM read_parquet('{sf_dir}/documents.parquet')").fetchall())
    x31 = {r[0]: (r[1], r[2]) for r in con.execute(
        f"SELECT cluster_id, keep_id, n_members FROM read_parquet('{out_dir}/x31_canonical/*.parquet')").fetchall()}
    exp31 = {}
    for members in comp.values():
        keep = sorted(members, key=lambda d: (-toks[d], d))[0]
        exp31[min(members)] = (keep, len(members))
    bad31 = [(c, x31.get(c), exp31[c]) for c in exp31 if x31.get(c) != exp31[c]]
    bad31 += [(c, x31[c], None) for c in x31 if c not in exp31]
    print(f"{'FAIL' if bad31 else 'PASS'} x31_canonical"
          + (f": {bad31[:3]}" if bad31 else ""))
    fails += bool(bad31)

    # x39: exact integer fixed-point replay (constants from Graph.scala)
    U, DP, ITERS = 10 ** 15, 85, 5
    n = len(docs)
    unit = U // n
    base = ((100 - DP) * unit) // 100
    adj, deg = {}, {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    rank = {d: unit for d in docs}
    for _ in range(ITERS):
        dangling = sum(rank[d] for d in docs if d not in deg)
        msg = {}
        for u, nbrs in adj.items():
            c = rank[u] // deg[u]
            for v in nbrs:
                msg[v] = msg.get(v, 0) + c
        rank = {d: base + (DP * (dangling // n + msg.get(d, 0))) // 100
                for d in docs}
    got39 = dict(con.execute(
        f"SELECT doc_id, rank FROM read_parquet('{out_dir}/x39_pagerank/*.parquet')").fetchall())
    bad39 = [(d, got39.get(d), rank[d] / float(U))
             for d in docs if got39.get(d) != rank[d] / float(U)]
    print(f"{'FAIL' if bad39 else 'PASS'} x39_pagerank"
          + (f": {bad39[:3]}" if bad39 else ""))
    fails += bool(bad39)

    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
