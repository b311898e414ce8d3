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
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_type(t):
    """Canonical dtype key. Deliberately KEEPS the naive-vs-tz-aware
    timestamp distinction (the q_asof_orders r6 bug class) while
    normalizing representation details that the driver's pandas-level
    compare also ignores: timestamp unit (DuckDB us vs parquet ns),
    int width (DuckDB int32 sums vs Spark long), string/large_string.
    """
    if pa.types.is_timestamp(t):
        return ("timestamp", "tz" if t.tz is not None else "naive")
    if pa.types.is_date(t):
        return ("date",)
    if pa.types.is_integer(t):
        return ("int",)
    if pa.types.is_floating(t):
        return ("float",)
    if pa.types.is_decimal(t):
        return ("decimal",)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return ("str",)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return ("bin",)
    if pa.types.is_boolean(t):
        return ("bool",)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", canon_type(t.value_type))
    if pa.types.is_struct(t):
        return ("struct",) + tuple(
            (f.name, canon_type(f.type)) for f in t)
    return (str(t),)


def dtype_mismatches(eng_schema, ora_schema):
    """Columns whose canonical dtype differs between engine and oracle."""
    eng = {f.name: canon_type(f.type) for f in eng_schema}
    ora = {f.name: canon_type(f.type) for f in ora_schema}
    return [(c, eng[c], ora[c]) for c in sorted(set(eng) & set(ora))
            if eng[c] != ora[c]]


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
            ora_tbl = con.execute(sql).arrow()
            ora_cols = ora_tbl.column_names
            ora_rows = [tuple(r[c] for c in ora_cols) for r in ora_tbl.to_pylist()]
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
        # dtype gate: the driver's schema/hash compare is dtype-sensitive;
        # catch drift (e.g. tz-aware vs naive timestamps) locally first
        dt_bad = dtype_mismatches(tbl.schema, ora_tbl.schema)
        if dt_bad:
            print(f"FAIL {name}: dtype mismatch (col, engine, oracle): {dt_bad}")
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


def selftest():
    """Seeded-drift check: an engine dump whose ts is tz-aware vs a naive
    oracle must FAIL the gate even though the instants (values) match."""
    import datetime
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        sf = os.path.join(d, "sf")
        out = os.path.join(d, "out")
        os.makedirs(sf)
        os.makedirs(os.path.join(out, "q_drift"))
        naive = [datetime.datetime(2024, 1, 1, 12, 0, 0),
                 datetime.datetime(2024, 1, 2, 12, 0, 0)]
        # dummy source tables (gate registers all of TABLES)
        for t in TABLES:
            pq.write_table(pa.table({"x": [1]}), f"{sf}/{t}.parquet")
        # oracle: naive timestamps straight from VALUES
        sql = ("SELECT * FROM (VALUES (1, TIMESTAMP '2024-01-01 12:00:00'),"
               " (2, TIMESTAMP '2024-01-02 12:00:00')) v(id, ts)")
        json.dump({"q_drift": sql}, open(f"{out}/oracle_sql.json", "w"))
        # engine dump: same instants, but tz-aware (the r6 bug shape)
        drift = pa.table({
            "id": pa.array([1, 2], pa.int32()),
            "ts": pa.array(naive, pa.timestamp("us", tz="UTC"))})
        pq.write_table(drift, f"{out}/q_drift/part-0.parquet")
        if main(sf, out) == 0:
            print("SELFTEST FAIL: tz-aware drift was NOT caught")
            return 1
        # control: naive engine dump must pass
        pq.write_table(pa.table({
            "id": pa.array([1, 2], pa.int32()),
            "ts": pa.array(naive, pa.timestamp("us"))}),
            f"{out}/q_drift/part-0.parquet")
        if main(sf, out) != 0:
            print("SELFTEST FAIL: matching dtypes flagged as drift")
            return 1
        print("SELFTEST OK: seeded tz drift caught, clean dump passes")
        return 0


if __name__ == "__main__":
    if sys.argv[1:] == ["--selftest"]:
        sys.exit(selftest())
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
