#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads oracle_sql.json from the verify output, registers the sf parquet
tables in DuckDB, runs each oracle, and compares against the engine's
parquet dump: columns sorted by name, rows sorted, values compared with
exact equality (floats too — the engine is expected to be bit-stable).
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            elif hasattr(v, "isoformat"):
                if getattr(v, "tzinfo", None) is not None:
                    import datetime
                    v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
                v = v.isoformat()
            vals.append((cols[i], v))
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            res = con.execute(sql)
            ora_cols = [d[0] for d in res.description]
            ora_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        try:
            tbl = ds.dataset(f"{out_dir}/{name}").to_table()
        except Exception as e:
            print(f"FAIL {name}: engine output missing: {e}")
            failures += 1
            continue
        eng_cols = tbl.column_names
        eng_rows = [tuple(r[c] for c in eng_cols) for r in tbl.to_pylist()]
        if sorted(eng_cols) != sorted(ora_cols):
            print(f"FAIL {name}: column mismatch engine={sorted(eng_cols)} oracle={sorted(ora_cols)}")
            failures += 1
            continue
        a = canon(eng_rows, eng_cols)
        b = canon(ora_rows, ora_cols)
        if len(a) != len(b):
            print(f"FAIL {name}: row count engine={len(a)} oracle={len(b)}")
            failures += 1
            continue
        bad = [(x, y) for x, y in zip(a, b) if x != y]
        if bad:
            print(f"FAIL {name}: {len(bad)} differing rows; first: engine={bad[0][0]} oracle={bad[0][1]}")
            failures += 1
        else:
            print(f"OK   {name}: {len(a)} rows")
    # rows-only queries
    import os
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                n = ds.dataset(p).to_table().num_rows
                print(f"ROWS {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            except Exception as e:
                print(f"ROWS {name}: unreadable: {e}")
    print("FAILURES:", failures)
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
