#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query output
under OUT_DIR (written by graft.Verify), run the matching oracle SQL from
oracle_sql.json in DuckDB over the same parquet tables, sort columns by name,
and compare row counts, schemas (loosely), and values.

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, sys, glob, os, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        pq = os.path.join(out_dir, name)
        files = glob.glob(f"{pq}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        # The driver hashes TYPED values, so a HUGEINT (DuckDB SUM default)
        # vs BIGINT mismatch fails there even when every value is equal
        # (r4's q49). Both frames come through duckdb fetchdf, so NULL
        # promotion is symmetric and dtype equality is a faithful proxy.
        dt_bad = [(c, str(got[c].dtype), str(exp[c].dtype))
                  for c in got.columns if got[c].dtype != exp[c].dtype]
        if dt_bad:
            c, g, e = dt_bad[0]
            print(f"FAIL {name}: dtype col {c}: spark={g} duckdb={e}"); n_fail += 1; continue
        def eq(a, b):
            if a is None and b is None:
                return True
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    return True
                # SQL NULL in a float column comes back as NaN from fetchdf;
                # tight relative tolerance for residual doubles (ADVICE r1).
                return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
            return a == b
        mismatch = None
        for c in got.columns:
            gv, ev = got[c].tolist(), exp[c].tolist()
            if gv != ev:
                for i, (a, b) in enumerate(zip(gv, ev)):
                    if not eq(a, b):
                        mismatch = (c, i, a, b); break
                if mismatch: break
        if mismatch:
            c, i, a, b = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} duckdb={b!r}")
            print(f"  dtypes: spark={got[c].dtype} duckdb={exp[c].dtype}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
