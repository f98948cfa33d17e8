#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle on the same sf dir and diff them.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s
    return v


def rows_of(cols_named):
    names = sorted(cols_named.keys())
    cols = [cols_named[n] for n in names]
    return names, (sorted(
        (tuple(canon(v) for v in row) for row in zip(*cols)),
        key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r),
    ) if cols else [])


def table_cols(t):
    return {name: t.column(name).to_pylist() for name in t.column_names}


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_t = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            failed.append(name)
            continue
        # The driver's gate sorts result rows with pandas, which cannot
        # hash numpy arrays: any nested (list/struct/map) output column
        # crashes the compare and the query counts as unverified. Fail
        # here first so that shape regression can never ship silently.
        nested = [f.name for f in spark_t.schema
                  if pa.types.is_nested(f.type)]
        if nested:
            print(f"FAIL {name}: nested output columns {nested} "
                  "(driver gate cannot sort these — explode or digest)")
            failed.append(name)
            continue
        try:
            duck_t = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        sn, sr = rows_of(table_cols(spark_t))
        dn, dr = rows_of(table_cols(duck_t))
        if sn != dn:
            print(f"FAIL {name}: columns differ\n  spark: {sn}\n  duck : {dn}")
            failed.append(name)
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: row count {len(sr)} vs {len(dr)}")
            failed.append(name)
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(sr)} rows differ; first:")
            i, a, b = bad[0]
            for c, (x, y) in zip(sn, zip(a, b)):
                if x != y:
                    print(f"    {c}: spark={x!r} duck={y!r}")
            failed.append(name)
        else:
            print(f"OK   {name}: {len(sr)} rows")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle) if not only else len(only)} passed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
