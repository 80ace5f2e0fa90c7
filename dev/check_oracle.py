#!/usr/bin/env python3
"""Dev-only self-check: compare Verify.scala output parquet vs DuckDB oracle.

Mimics the driver's compare: for each query in oracle_sql.json, run the SQL
in DuckDB with the sf tables registered as views, load the Spark result
parquet, sort columns by name, sort rows, and compare values cell-by-cell.

Usage: python3 dev/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, math, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(rows, cols):
    """Sort columns by name, stringify values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(cell(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out

def cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            # Type discipline: only STRING/BIGINT-or-narrower-int/DOUBLE/BOOLEAN
            # survive every engine->client path identically. DECIMAL, HUGEINT,
            # DATE, TIMESTAMP render differently via pandas vs fetchall and
            # would hash-mismatch in the driver even when values are equal.
            risky = ("DECIMAL", "HUGEINT", "DATE", "TIMESTAMP")
            bad_types = []
            for q, side in ((sql, "oracle"),
                            (f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')", "spark")):
                for row in con.execute(f"DESCRIBE {q}").fetchall():
                    cname, ctype = row[0], row[1]
                    if any(t in ctype.upper() for t in risky):
                        bad_types.append(f"{side}.{cname}:{ctype}")
            if bad_types:
                print(f"FAIL {name}: risky output types: {bad_types}")
                n_fail += 1
                continue
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
            sq = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            scols = [d[0] for d in sq.description]
            srows = sq.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        oc, orr = canon(orows, ocols)
        sc, srr = canon(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: columns differ  oracle={oc}  spark={sc}")
            n_fail += 1
            continue
        if len(orr) != len(srr):
            print(f"FAIL {name}: row count oracle={len(orr)} spark={len(srr)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(orr, srr)) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(orr)} rows differ; first 3:")
            for i, a, b in bad[:3]:
                for c, (x, y) in zip(oc, zip(a, b)):
                    if x != y:
                        print(f"    row {i} col {c}: oracle={x!r} spark={y!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
