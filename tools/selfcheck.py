#!/usr/bin/env python3
"""Dev-only self-check: compare Verify output parquet against DuckDB
oracle_sql.json, mimicking the driver's compare (sort columns by name,
sort rows, exact value compare). Usage:
  python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

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
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    # keep out-of-core spill bounded and off the repo tree (a 25M-pair
    # join at sf1 once filled the disk and killed a concurrent run).
    # PER-RUN spill dir, removed on exit: a shared /tmp/duckspill made
    # concurrent selfchecks contend for one size cap, and leftover
    # spill from a killed run counted against the next run's budget.
    import os as _os, tempfile as _tempfile, atexit as _atexit, shutil as _shutil
    spill = _tempfile.mkdtemp(prefix="duckspill-", dir="/tmp")
    _atexit.register(_shutil.rmtree, spill, True)
    con.sql(f"SET temp_directory='{spill}'")
    con.sql(f"SET memory_limit='{_os.environ.get('SELF_CHECK_MEM', '24GB')}'")
    con.sql(f"SET max_temp_directory_size='{_os.environ.get('SELF_CHECK_SPILL', '20GB')}'")
    import os
    for t in TABLES:
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"  # Spark-written table directory
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        # the driver's pandas canonicalizer cannot sort ARRAY/MAP/STRUCT
        # cells (unhashable numpy arrays) — fail here, before the driver
        # does, even though this DuckDB repr compare could handle them
        nested = [(got.columns[i], str(got.types[i])) for i in range(len(got.types))
                  if any(k in str(got.types[i]) for k in ("[]", "MAP", "STRUCT", "LIST"))]
        if nested:
            print(f"FAIL {name}: nested output columns break the driver harness: {nested}")
            fails += 1; continue
        gcols, grows = canon(got.fetchall(), got.columns)
        try:
            want = con.sql(sql)
            wcols, wrows = canon(want.fetchall(), want.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
        if gcols != wcols:
            print(f"FAIL {name}: cols {gcols} != {wcols}"); fails += 1; continue
        # type-sensitive, like the driver's hasher: DuckDB types of the
        # Spark parquet output must equal the oracle result's types
        # (e.g. HUGEINT vs BIGINT hash-mismatches even when values agree)
        order = sorted(range(len(got.columns)), key=lambda i: got.columns[i])
        gtypes = [str(got.types[i]) for i in order]
        worder = sorted(range(len(want.columns)), key=lambda i: want.columns[i])
        wtypes = [str(want.types[i]) for i in worder]
        if gtypes != wtypes:
            mism = [(gcols[j], gtypes[j], wtypes[j])
                    for j in range(len(gtypes)) if gtypes[j] != wtypes[j]]
            print(f"FAIL {name}: types differ {mism}"); fails += 1; continue
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rows {len(grows)} != {len(wrows)}"); fails += 1; continue
        bad = [(a, b) for a, b in zip(grows, wrows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: {bad[0][0]} != {bad[0][1]}")
            fails += 1
        else:
            print(f"OK   {name} ({len(grows)} rows)")
    # SUBSET queries (probabilistic operators, e.g. dd03's LSH banding):
    # every Spark row must appear in the oracle result (soundness); the
    # recall fraction is reported but not gated here — the exact dual
    # runs in-CI against a JVM replica of the banding.
    import os.path
    subp = f"{outdir}/subset_sql.json"
    if os.path.exists(subp):
        for name, sql in sorted(json.load(open(subp)).items()):
            if only and name not in only:
                continue
            files = glob.glob(f"{outdir}/{name}/*.parquet")
            if not files:
                print(f"FAIL {name}: no spark output"); fails += 1; continue
            got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
            gcols, grows = canon(got.fetchall(), got.columns)
            try:
                want = con.sql(sql)
                wcols, wrows = canon(want.fetchall(), want.columns)
            except Exception as e:
                print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
            if gcols != wcols:
                print(f"FAIL {name}: cols {gcols} != {wcols}"); fails += 1; continue
            extra = set(grows) - set(wrows)
            if extra:
                print(f"FAIL {name}: {len(extra)} spark rows NOT in oracle; first: {sorted(extra)[0]}")
                fails += 1
            else:
                rec = len(grows) / len(wrows) if wrows else 1.0
                print(f"OK   {name} (subset: {len(grows)}/{len(wrows)} rows, recall {rec:.2f})")
    sys.exit(1 if fails else 0)

main()
