#!/usr/bin/env python3
"""Build a deterministic DOCUMENT SLICE of an sf dir, so the all-pairs
ground-truth oracles (q31/q59/q73/q81/q103 — brute-force SQL that DuckDB
cannot finish at 500k docs) can be checked AT SCALE: the Spark side runs
the same scale code paths over the slice, and the exact oracle finishes
because the slice is ~target docs.

Slice-size economics, measured: DuckDB's all-pairs SQL is quadratic in
docs and linear in tokens/doc — at sf10 content (~630 chars/doc) a
5k-doc slice never finished one oracle in 45 min, while the 1250-doc
default validates all five in 79-266 s each (12.5M vs 0.8M pairs).

The slice key is the portable md5(text) bucket (the ops.Splits rule), so
  - both engines compute the identical slice (no Spark-side changes: the
    slice is just another sfDir);
  - EXACT-DUPLICATE CLUSTERS NEVER STRADDLE THE CUT (same text = same md5
    = same bucket), so the dedup-pair structure the skipped queries exist
    to test survives slicing intact — unlike a row-number sample;
  - near-duplicate pairs survive at the bucket rate (a 1/K slice keeps
    ~1/K of cross-doc near-dup pairs), still plenty at 500k→5k.

Other tables are symlinked — only `documents` is sliced (the five
all-pairs oracles read nothing else; embeddings-based oracles all finish
at sf10 already).

Usage: subset_sf.py <sfDir> <sliceDir> [--docs 1250]
Then:  sbt "runMain graft.Verify <sliceDir> <out> q31_…,q59_…,…"
       python3 tools/validate_oracle.py <sliceDir> <out> --only q31_…,…
(Driver-side tooling only — never imported by the engine.)
"""
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, target_docs=1250):
    sf_dir = os.path.abspath(sf_dir)
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    src = f"{sf_dir}/documents.parquet"
    if os.path.isdir(src):
        src += "/*.parquet"
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{src}')").fetchone()[0]
    k = max(1, n // target_docs)
    dst = f"{out_dir}/documents.parquet"
    # one bucket of the portable md5 hash; bucket 0 keeps ~n/k docs
    con.execute(f"""
        COPY (SELECT * FROM read_parquet('{src}')
              WHERE CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT)
                    % {k} = 0)
        TO '{dst}' (FORMAT PARQUET)""")
    kept = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{dst}')").fetchone()[0]
    for t in TABLES:
        if t == "documents":
            continue
        link = f"{out_dir}/{t}.parquet"
        if not os.path.lexists(link):
            os.symlink(f"{sf_dir}/{t}.parquet", link)
    print(f"slice: {kept}/{n} docs (bucket 0 of {k}) -> {out_dir}")
    return 0


if __name__ == "__main__":
    docs = 1250
    if "--docs" in sys.argv:
        docs = int(sys.argv[sys.argv.index("--docs") + 1])
    sys.exit(main(sys.argv[1], sys.argv[2], docs))
