#!/usr/bin/env python3
"""Local pre-check of the driver's DuckDB oracle gate.

Usage: python3 tools/oracle_check.py /tmp/verify_out /root/testdata/sf0.01
Loads each <out>/<name> spark parquet result, runs oracle_sql.json[name]
in DuckDB over the sf parquet tables, sorts columns by name, and compares
values (floats to ~1e-9 relative; everything else exact).
"""
import json, math, sys

import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def close(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b


def main(outdir, sfdir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = 0
    for name, sql in sorted(oracle.items()):
        try:
            import glob
            files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
            spark_tbl = pa.concat_tables([pq.read_table(f) for f in files])
            scols = sorted(spark_tbl.column_names)
            sdata = [[norm(v) for v in spark_tbl.column(c).to_pylist()] for c in scols]
            duck = con.execute(sql).fetch_arrow_table()
            dcols = sorted(duck.column_names)
            ddata = [[norm(v) for v in duck.column(c).to_pylist()] for c in dcols]
            if scols != dcols:
                print(f"FAIL {name}: cols spark={scols} duck={dcols}")
                continue
            srows = list(zip(*sdata)) if sdata else []
            drows = list(zip(*ddata)) if ddata else []
            if len(srows) != len(drows):
                print(f"FAIL {name}: rows spark={len(srows)} duck={len(drows)}")
                continue
            bad = None
            for i, (sr, dr) in enumerate(zip(srows, drows)):
                if not all(close(a, b) for a, b in zip(sr, dr)):
                    bad = (i, sr, dr)
                    break
            if bad:
                print(f"FAIL {name}: row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
                continue
            # exact-hash check on floats (the driver hashes values)
            exact = all(
                norm(a) == norm(b)
                for sr, dr in zip(srows, drows)
                for a, b in zip(sr, dr)
            )
            tag = "PASS" if exact else "PASS(~)"
            if tag == "PASS":
                n_pass += 1
            print(f"{tag} {name}: {len(srows)} rows")
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
    print(f"\n{n_pass}/{len(oracle)} exact-match")


if __name__ == "__main__":
    # optional 3rd arg: comma-separated query-name filter (used to shard
    # the heavy sf0.1 exhaustive oracles across parallel processes)
    main(sys.argv[1], sys.argv[2],
         set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None)
