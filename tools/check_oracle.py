#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Reads the parquet dumps written by `graft.Verify` plus oracle_sql.json,
runs each oracle SQL in DuckDB against views over the sf tables, and
compares: column names (sorted), row count, and cell-by-cell values in
result order (which both sides make total via ORDER BY).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> \
           [--budget SECONDS] [--json OUT.json]

--budget fails any single oracle whose DuckDB execution exceeds the
given wall-clock seconds — the guard against oracle SQL that is correct
but too expensive for the driver's correctness phase (the r6 failure
mode: one exponentially-inlined CTE chain timed out the whole gate and
zeroed the round's record). --json writes the per-query outcome as a
committable artifact (CORRECTNESS_local_rN.json).
"""
import decimal
import json
import math
import re
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Oracle output types the driver's hasher is known to serialize
# differently from Spark's even when values are identical. r8 proved
# HUGEINT and DECIMAL(p<=18) unsafe; r9 falsified the "wide decimals
# are safe" theory at DECIMAL(38,4) with value-identical dumps of
# x28/x33/x58 still hash-failing the driver. So the lint now rejects
# ANY decimal output column: present exact decimal arithmetic as
# DOUBLE (a 4-decimal value converts correctly-rounded and identically
# in both engines). Python == is blind to all of this
# (Decimal("1.50") == Decimal("1.5"), hugeint == int64), so the gate
# LINTS the oracle result schema and fails any query that emits one —
# before value comparison even runs.
_DECIMAL = re.compile(r"DECIMAL\(\d+,\s*\d+\)")


def hash_unsafe(duck_type, query=None, column=None):
    t = duck_type.upper()
    if t == "HUGEINT":
        return "HUGEINT"
    if _DECIMAL.search(t):
        return t
    return None


def canon(v):
    """Type-faithful canonical string of a cell — compares the way the
    driver HASHES (serialization-sensitive), not the way Python == does.
    Distinguishes int from float from Decimal, preserves decimal scale
    (Decimal('1.50') != Decimal('1.5')), and normalizes -0.0 to its repr
    so a sign difference is visible."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"


def main(sf_dir, out_dir, budget=None, json_out=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    record = {}
    for name, sql in sorted(oracle.items()):
        oracle_sec = None
        try:
            res_dir = f"{out_dir}/{name}"
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            t0 = time.monotonic()
            exp = con.execute(sql)
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
            oracle_sec = round(time.monotonic() - t0, 3)
            # type LINT on the oracle's own result schema
            lint = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            record[name] = {"status": "fail", "errs": [f"exception {e}"]}
            n_fail += 1
            continue
        errs = []
        for cname, ctype, *_ in lint:
            bad = hash_unsafe(str(ctype), name, cname)
            if bad:
                errs.append(
                    f"hash-unsafe oracle output type: {cname} is {bad} "
                    "(cast to BIGINT / DOUBLE — driver hashes it "
                    "differently from Spark even when values match)")
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
        if budget is not None and oracle_sec > budget:
            errs.append(
                f"oracle over budget: {oracle_sec}s > {budget}s "
                "(would risk timing out the driver's correctness phase)")
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs[:4]))
            record[name] = {"status": "fail", "oracle_sec": oracle_sec,
                            "errs": errs[:4]}
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows, oracle {oracle_sec}s)")
            record[name] = {"status": "pass", "rows": len(got_rows),
                            "oracle_sec": oracle_sec}
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        Path(json_out).write_text(json.dumps(
            {"sf_dir": sf_dir, "pass": n_pass, "fail": n_fail,
             "budget_sec": budget, "queries": record}, indent=1) + "\n")
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


USAGE = ("usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> "
         "[--budget SECONDS] [--json OUT.json]")


def _flag(args, name):
    """Pop `name VALUE` from args; None if absent; usage error if the
    value is missing."""
    if name not in args:
        return None
    i = args.index(name)
    if i + 1 >= len(args):
        sys.exit(f"{name} needs a value\n{USAGE}")
    v = args[i + 1]
    del args[i:i + 2]
    return v


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    raw_budget = _flag(args, "--budget")
    try:
        budget = float(raw_budget) if raw_budget is not None else None
    except ValueError:
        sys.exit(f"--budget takes seconds, got {raw_budget!r}\n{USAGE}")
    json_out = _flag(args, "--json")
    if len(args) != 2:
        sys.exit(USAGE)
    sys.exit(main(args[0], args[1], budget, json_out))
