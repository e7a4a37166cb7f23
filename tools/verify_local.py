#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/verify_local.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet (written by graft.Verify), runs the
matching SQL from <out>/oracle_sql.json in DuckDB over the sf parquet
tables, and compares: row count, column names (sorted), and a hash of
all values with columns sorted by name. Mirrors the driver's described
compare so oracle mismatches surface before the round gate runs.
"""
import glob
import hashlib
import json
import math
import os
import sys
from decimal import Decimal

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    # Decimal must NOT collapse to the int rendering: DuckDB integer
    # sum() returns HUGEINT (Arrow decimal128), which the driver's
    # hasher renders distinctly from Spark's int64. Keeping the type
    # visible here is what makes local green predict driver green
    # (round-1 lesson: str(fetchall()) hid 11 driver failures).
    if isinstance(v, Decimal):
        return f"Decimal('{v}')"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def fetch_arrow(cur):
    """Fetch a DuckDB result via Arrow, like the driver does.

    Arrow preserves logical types (HUGEINT -> decimal128 -> Decimal),
    unlike fetchall(), which converts HUGEINT to a plain Python int and
    masks type drift vs Spark's parquet output.
    """
    tbl = cur.arrow()
    cols = list(tbl.column_names)
    # positional access (tbl.columns), not by name: name lookup raises
    # on duplicate column names and would kill the whole gate
    pycols = [col.to_pylist() for col in tbl.columns]
    rows = list(zip(*pycols)) if cols else []
    types = [str(f.type) for f in tbl.schema]
    return cols, rows, types


def decimal_cols(cols, types):
    """Output columns whose Arrow type is any decimal flavor.

    Round-11 lesson (pipe_warc_roundtrip): this replica normalizes
    Spark decimal128 and DuckDB HUGEINT values to the same string, but
    the DRIVER's hasher renders them differently — so a decimal-typed
    OUTPUT column can be locally green and driver-red. The catalogue
    convention is therefore: decimal/HUGEINT arithmetic stays internal;
    every final integer column is CAST to int64 on BOTH sides. This
    check makes the replica conservative — any decimal output column is
    a failure even if the values match.
    """
    return sorted(c for c, t in zip(cols, types) if "decimal" in t)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for row in rows:
        h.update(("\x1f".join(norm(row[i]) for i in order) + "\x1e").encode())
    return h.hexdigest()


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)

    results = {}
    names = sorted(
        os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p)
    )
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got_cols, got_rows, got_types = fetch_arrow(con.execute(
            "SELECT * FROM read_parquet([" + ",".join(f"'{f}'" for f in files) + "])"
        ))
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got_rows)}" + (
                " EMPTY!" if not got_rows else ""
            )
            continue
        try:
            want_cols, want_rows, want_types = fetch_arrow(con.execute(oracle[name]))
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        risky = sorted(set(decimal_cols(got_cols, got_types))
                       | set(decimal_cols(want_cols, want_types)))
        if risky:
            results[name] = (
                f"DECIMAL_OUTPUT cols={risky} — cast to BIGINT on both sides; "
                "the driver hasher renders decimal128/HUGEINT unlike int64"
            )
            continue
        if sorted(got_cols) != sorted(want_cols):
            results[name] = f"SCHEMA_MISMATCH got={sorted(got_cols)} want={sorted(want_cols)}"
            continue
        if len(got_rows) != len(want_rows):
            results[name] = f"ROWCOUNT_MISMATCH got={len(got_rows)} want={len(want_rows)}"
            continue
        gh = table_hash(got_cols, got_rows)
        wh = table_hash(want_cols, want_rows)
        if gh != wh:
            # find first differing row for debugging
            go = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
            wo = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
            detail = ""
            for i, (g, w) in enumerate(zip(got_rows, want_rows)):
                gn = [norm(g[j]) for j in go]
                wn = [norm(w[j]) for j in wo]
                if gn != wn:
                    detail = f" first_diff_row={i} got={gn} want={wn}"
                    break
            results[name] = "HASH_MISMATCH" + detail
        else:
            results[name] = f"OK rows={len(got_rows)}"

    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "ROWS_ONLY rows=")))
    for k in sorted(results):
        print(f"{results[k].split()[0]:>18}  {k}  {' '.join(results[k].split()[1:])[:500]}")
    print(f"\n{n_ok}/{len(results)} pass")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
