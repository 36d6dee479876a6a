#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracle.py <sfdir> <verify_outdir>

For each query in <outdir>/oracle_sql.json: run the SQL in DuckDB (tables
pre-registered as views over <sfdir>/*.parquet), load the Spark parquet
result, sort columns by name, sort rows, compare exactly (bitwise for
floats). Prints per-query rows/schema/hash verdicts.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for r in rows:
        rr = []
        for v in r:
            if isinstance(v, float):
                rr.append(("f", repr(v)))
            else:
                rr.append((type(v).__name__, repr(v)))
        out.append(tuple(rr))
    out.sort()
    return out


def main(sfdir, outdir):
    con = duckdb.connect()
    # Bound DuckDB: the default memory_limit is 80% of RAM with no spill
    # path, so one heavy oracle (deep CTE chains re-inlined per
    # reference) can balloon the shared connection until the allocator —
    # or the OS OOM-killer — kills the sweep mid-run, which silently
    # zeroes the round's artifact (the credible r9 `{}` failure mode).
    # With a hard limit + temp_directory DuckDB spills instead of dying.
    import os
    con.execute(f"SET memory_limit='{os.environ.get('ORACLE_MEM', '24GB')}'")
    con.execute(f"SET threads={os.environ.get('ORACLE_THREADS', '8')}")
    # Spill dir: per-run (inside this sweep's outdir) unless overridden —
    # a shared /tmp path collides between concurrent sweeps and can be
    # unwritable if another user created it first.
    spill = os.environ.get("ORACLE_SPILL",
                           os.path.join(outdir, "duckdb_oracle_spill"))
    con.execute(f"SET temp_directory='{spill}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = 0
    for name in sorted(oracle):
        # Type-pin: DESCRIBE both sides and compare result-column TYPES, not
        # just names. DuckDB promotes SUM(BIGINT) to HUGEINT and some builds
        # type date_trunc as TIMESTAMP; the driver's DuckDB canonicalizes those
        # differently from the values the local client fetches, so a type
        # mismatch here is exactly the drift class that hash-fails remotely
        # while bit-matching locally (see VERDICT r6: weighted_avg_dpd,
        # ema_monthly_value). DESCRIBE runs inside the same per-query guards
        # as the data reads: one broken query must not abort the sweep.
        try:
            ores = con.execute(oracle[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
            otypes = dict(con.execute(
                f"SELECT column_name, column_type FROM (DESCRIBE {oracle[name]})").fetchall())
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}")
            continue
        try:
            sres = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            scols = [d[0] for d in sres.description]
            srows = sres.fetchall()
            stypes = dict(con.execute(
                "SELECT column_name, column_type FROM (DESCRIBE SELECT * FROM "
                f"read_parquet('{outdir}/{name}/*.parquet'))").fetchall())
        except Exception as e:
            print(f"{name}: SPARK RESULT ERROR {e}")
            continue
        type_diffs = {c: (stypes.get(c), otypes.get(c))
                      for c in set(otypes) | set(stypes)
                      if stypes.get(c) != otypes.get(c)}
        oidx = sorted(range(len(ocols)), key=lambda i: ocols[i])
        sidx = sorted(range(len(scols)), key=lambda i: scols[i])
        schema_match = sorted(ocols) == sorted(scols) and not type_diffs
        orows_s = canon([[r[i] for i in oidx] for r in orows])
        srows_s = canon([[r[i] for i in sidx] for r in srows])
        rows_match = len(orows) == len(srows)
        hash_match = orows_s == srows_s
        ok = schema_match and rows_match and hash_match
        n_ok += ok
        msg = "OK" if ok else f"FAIL rows={len(srows)}/{len(orows)} schema={schema_match} hash={hash_match}"
        print(f"{name}: {msg}")
        if not ok and schema_match and rows_match:
            for a, b in zip(srows_s, orows_s):
                if a != b:
                    print(f"  first diff:\n   spark : {a}\n   oracle: {b}")
                    break
        elif not schema_match:
            print(f"  spark cols : {sorted(scols)}\n  oracle cols: {sorted(ocols)}")
            for c, (st, ot) in sorted(type_diffs.items()):
                print(f"  type drift : {c}: spark={st} oracle={ot}")
    print(f"\n{n_ok}/{len(oracle)} queries match")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
