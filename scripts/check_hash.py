#!/usr/bin/env python3
"""DuckDB-side multiset-hash compare for HUGE query outputs.

scripts/check.py canonicalizes cell-by-cell in Python — exact, but
O(cells) interpreter work that takes hours on the 18-94M-row outputs
the sf3 sweep produces. This variant never leaves DuckDB: both sides
(the Spark parquet result and the oracle SQL result) are reduced to

    (row count, sum over rows of hash(row cast to VARCHAR per column))

an order-independent multiset digest computed at C speed. Columns are
compared sorted by name with every value cast to VARCHAR by DuckDB
itself, so both sides get the identical formatting; doubles pass
through a DOUBLE cast first, which maps Spark float32 readback and
int-vs-bigint partition dtypes onto one representation (the dtype
slack check.py already tolerates).

Usage: python3 scripts/check_hash.py <verifyOutDir> <sfDir> <query...>
"""
import glob
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def digest(con, rel_sql, name):
    cols = [r[0] for r in con.sql(f"DESCRIBE {rel_sql}").fetchall()]
    types = {r[0]: r[1] for r in con.sql(f"DESCRIBE {rel_sql}").fetchall()}
    parts = []
    for c in sorted(cols):
        t = types[c]
        e = f'"{c}"'
        if t in ("FLOAT", "DOUBLE", "REAL") or t.startswith("DECIMAL"):
            e = f"CAST({e} AS DOUBLE)"
        elif t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT", "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
            e = f"CAST({e} AS BIGINT)"
        parts.append(f"COALESCE(CAST({e} AS VARCHAR), 'NULL')")
    row = " || '|' || ".join(parts)
    n, h = con.sql(
        f"SELECT count(*), COALESCE(sum(hash({row})::HUGEINT), 0) FROM {rel_sql}").fetchall()[0]
    return sorted(cols), n, h


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in names:
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files or name not in oracle:
            print(f"FAIL  {name}: missing output or oracle")
            n_fail += 1
            continue
        spark_rel = f"(SELECT * FROM read_parquet({files!r}))"
        con.sql(f"CREATE OR REPLACE VIEW __oracle__ AS {oracle[name]}")
        scols, sn, sh = digest(con, spark_rel, name)
        dcols, dn, dh = digest(con, "__oracle__", name)
        if scols != dcols:
            print(f"FAIL  {name}: columns spark={scols} duckdb={dcols}")
            n_fail += 1
        elif sn != dn:
            print(f"FAIL  {name}: rows spark={sn} duckdb={dn}")
            n_fail += 1
        elif sh != dh:
            print(f"FAIL  {name}: multiset hash mismatch over {sn} rows")
            n_fail += 1
        else:
            print(f"PASS  {name}  ({sn} rows, multiset-hash)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")


if __name__ == "__main__":
    main()
