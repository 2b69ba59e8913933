#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles, mimicking the driver:
for each query dir under the verify out dir, run the oracle SQL in DuckDB
over the same sf parquet tables, sort columns by name + rows, compare.

Usage: validate_oracle.py <sfDir> <verifyOutDir> [--skip q1,q2 | --only q1,q2]

--skip exists for LARGE sf runs (sf1+): a few oracles are deliberately
all-pairs SQL (the engine under test is subquadratic; the oracle is the
brute-force ground truth) and DuckDB can't finish them at 50k docs.
Skipped queries are reported as SKIP lines, never counted as ok.
(Driver-side tooling only — never imported by the engine.)
"""
import json, math, sys, threading, time
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

def main(sf_dir, out_dir, skip=(), only=(), timeout=None):
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver testdata is a single file; GenScale output is a directory
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if (skip and name in skip) or (only and name not in only):
            print(f"SKIP {name}")
            n_skip += 1
            continue
        t0 = time.time()
        # Oracle-side guard for big-sf runs: interrupt DuckDB if one oracle
        # exceeds the budget (all-pairs ground-truth SQL at 50k docs). The
        # ENGINE result is not in question here — only the oracle's cost.
        timer = None
        if timeout:
            timer = threading.Timer(timeout, con.interrupt)
            timer.start()
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
        except KeyboardInterrupt:
            print(f"SKIP {name}: oracle exceeded {timeout}s "
                  f"(all-pairs ground-truth SQL — engine result not judged)")
            n_skip += 1
            continue
        except Exception as e:
            if timeout and "INTERRUPT" in (str(e) + type(e).__name__).upper():
                print(f"SKIP {name}: oracle exceeded {timeout}s "
                      f"(all-pairs ground-truth SQL — engine result not judged)")
                n_skip += 1
            else:
                print(f"FAIL {name}: exec error: {e}")
                n_bad += 1
            continue
        finally:
            if timer:
                timer.cancel()
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
            print(f"OK   {name}: {len(grows)} rows ({time.time() - t0:.1f}s)")
            n_ok += 1
        else:
            n_bad += 1
            diff = [(a, b) for a, b in zip(gk, ek) if a != b]
            print(f"FAIL {name}: {len(grows)} vs {len(erows)} rows, "
                  f"{len(diff)} differing (first: "
                  f"{diff[0] if diff else 'row count'})")
    tail = f", {n_skip} skipped" if n_skip else ""
    print(f"== {n_ok} ok, {n_bad} bad{tail} ==")
    return 1 if n_bad else 0

def parse_list(flag):
    if flag in sys.argv:
        return set(sys.argv[sys.argv.index(flag) + 1].split(","))
    return set()

def parse_num(flag):
    if flag in sys.argv:
        return float(sys.argv[sys.argv.index(flag) + 1])
    return None

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  skip=parse_list("--skip"), only=parse_list("--only"),
                  timeout=parse_num("--timeout")))
