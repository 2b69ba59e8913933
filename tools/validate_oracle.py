#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver:
for each query dir under the verify out dir, run the oracle SQL in DuckDB
over the same sf parquet tables, sort columns by name + rows, compare.

Usage: validate_oracle.py <sfDir> <verifyOutDir>
(Driver-side tooling only — never imported by the engine.)
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision repr → catches any fp divergence
    return str(v)

def frame_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            grows, gcols = got.fetchall(), [d[0] for d in got.description]
            exp = con.execute(sql)
            erows, ecols = exp.fetchall(), [d[0] for d in exp.description]
            # The driver hashes PANDAS frames — duckdb HUGEINT (window/agg
            # SUM over ints) silently becomes float64 there, so "5.0" vs
            # "5" fails the hash even when fetchall() values are identical
            # (the round-3 q67 failure). Compare pandas dtypes to catch it.
            gdt = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).df().dtypes
            edt = con.execute(sql).df().dtypes
            drift = [c for c in gdt.index
                     if c in edt.index and str(gdt[c]) != str(edt[c])]
            if drift:
                c = drift[0]
                print(f"FAIL {name}: pandas dtype {c}: "
                      f"spark={gdt[c]} oracle={edt[c]} "
                      f"(driver hash WILL mismatch — CAST in the oracle)")
                n_bad += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_bad += 1
            continue
        if sorted(gcols) != sorted(ecols):
            print(f"FAIL {name}: cols spark={sorted(gcols)} oracle={sorted(ecols)}")
            n_bad += 1
            continue
        # dtype drift (warning-level): duckdb's HUGEINT/BIGINT vs spark's
        # INT/BIGINT would trip a strict schema compare
        gtypes = {d[0]: str(d[1]) for d in got.description}
        etypes = {d[0]: str(d[1]) for d in exp.description}
        for c in gtypes:
            if gtypes[c] != etypes.get(c):
                print(f"WARN {name}: dtype {c}: spark={gtypes[c]} oracle={etypes.get(c)}")
        if len(grows) == 0:
            print(f"WARN {name}: zero rows (weak signal)")
        gk, ek = frame_key(grows, gcols), frame_key(erows, ecols)
        if gk == ek:
            print(f"OK   {name}: {len(grows)} rows")
            n_ok += 1
        else:
            n_bad += 1
            diff = [(a, b) for a, b in zip(gk, ek) if a != b]
            print(f"FAIL {name}: {len(grows)} vs {len(erows)} rows, "
                  f"{len(diff)} differing (first: "
                  f"{diff[0] if diff else 'row count'})")
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
