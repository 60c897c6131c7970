#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Reads the parquet dumps written by `graft.Verify` plus oracle_sql.json,
runs each oracle SQL in DuckDB against views over the sf tables, and
compares: column names (sorted), row count, and cell-by-cell values in
result order (which both sides make total via ORDER BY).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            res_dir = f"{out_dir}/{name}"
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        errs = []
        if sorted(got_cols) != sorted(exp_cols):
            errs.append(f"cols spark={sorted(got_cols)} duck={sorted(exp_cols)}")
        if len(got_rows) != len(exp_rows):
            errs.append(f"rows spark={len(got_rows)} duck={len(exp_rows)}")
        if not errs:
            # driver sorts columns by name before hashing values
            gi = [got_cols.index(c) for c in sorted(got_cols)]
            ei = [exp_cols.index(c) for c in sorted(exp_cols)]
            for r, (g, e) in enumerate(zip(got_rows, exp_rows)):
                gr = tuple(canon(g[i]) for i in gi)
                er = tuple(canon(e[i]) for i in ei)
                if gr != er:
                    errs.append(f"row {r}: spark={gr} duck={er}")
                    if len(errs) > 3:
                        break
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
