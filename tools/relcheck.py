#!/usr/bin/env python3
"""Dev-only cross-engine check for the relational-corpus fuzz: compare
the RelDuckFuzzMain parquet dumps against the DuckDB-rendered duals in
duck_sql.json (the selfcheck.py discipline applied to generated
star-schema corpora). Usage:
  python3 tools/relcheck.py <corpusDir> <verifyOutDir> [case ...]
Exit 0 = every case matched (columns, types, sorted rows).
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer orders lineitem events".split()

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = float(v)
            rr.append(repr(v))
        out.append(tuple(rr))
    out.sort()
    return [cols[i] for i in order], out

def main():
    corpus, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{outdir}/duck_sql.json"))
    con = duckdb.connect()
    # the Spark session the engine ran under is UTC with
    # nulls-first-on-asc ordering: LIMIT/OFFSET pages must cut the
    # same rows when NULL dim values sort at a page boundary
    con.sql("SET TimeZone='UTC'")
    con.sql("SET default_null_order='nulls_first_on_asc_last_on_desc'")
    for t in TABLES:
        path = f"{corpus}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        # defensive: if a writer annotated timestamps as UTC-adjusted,
        # DuckDB reads TIMESTAMPTZ — normalize to naive UTC wall clock
        # so the duals' comparisons see what Spark saw
        desc = con.sql(f"DESCRIBE SELECT * FROM '{path}'").fetchall()
        cols = ", ".join(
            f'CAST("{c}" AS TIMESTAMP) AS "{c}"' if ty == "TIMESTAMP WITH TIME ZONE"
            else f'"{c}"' for c, ty, *_ in desc)
        con.sql(f"CREATE VIEW {t} AS SELECT {cols} FROM '{path}'")
    fails = ok = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        if got.columns == ["relduck_error"]:
            print(f"FAIL {name}: spark-side error {got.fetchall()[0][0]}")
            fails += 1; continue
        gcols, grows = canon(got.fetchall(), got.columns)
        try:
            want = con.sql(sql)
            wcols, wrows = canon(want.fetchall(), want.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
        if gcols != wcols:
            print(f"FAIL {name}: cols {gcols} != {wcols}"); fails += 1; continue
        order = sorted(range(len(got.columns)), key=lambda i: got.columns[i])
        gtypes = [str(got.types[i]) for i in order]
        worder = sorted(range(len(want.columns)), key=lambda i: want.columns[i])
        wtypes = [str(want.types[i]) for i in worder]
        if gtypes != wtypes:
            mism = [(gcols[j], gtypes[j], wtypes[j])
                    for j in range(len(gtypes)) if gtypes[j] != wtypes[j]]
            print(f"FAIL {name}: types differ {mism}"); fails += 1; continue
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rows {len(grows)} != {len(wrows)}")
            fails += 1; continue
        bad = [(a, b) for a, b in zip(grows, wrows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; "
                  f"first: {bad[0][0]} != {bad[0][1]}")
            fails += 1
        else:
            ok += 1
    print(f"relcheck: {ok} OK, {fails} FAIL")
    sys.exit(1 if fails else 0)

main()
