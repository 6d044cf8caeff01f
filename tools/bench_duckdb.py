#!/usr/bin/env python3
"""DuckDB-side of the BASELINE.md §4 comparison: run every oracle SQL from a
Verify dump's oracle_sql.json over the given sf dir, warmed, min of three
timed passes (the same discipline as graft.Bench), and print per-query + total.

Usage: python3 tools/bench_duckdb.py /root/testdata/sf0.1 /tmp/verify_out [--json]

--json prints a single machine-readable line instead of the table; graft.Bench
invokes this mode to embed a SAME-SESSION paired DuckDB total in its output
(unpaired cross-host ratios drift +/-20% on host noise — BASELINE.md §4).
"""
import json, os, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir, as_json=False):
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(src):  # multi-file layout (tools/gen_scale.py)
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # BENCH_DUCKDB_SKIP: comma-separated oracle names to leave out — for
    # corpora where a specific SQL oracle is intractable (q56's recursive
    # CC at 10x percolates into a giant component; see tools/cc_check.py).
    # The Scala side pairs totals over the queries ACTUALLY timed here.
    skip = {s for s in os.environ.get("BENCH_DUCKDB_SKIP", "").split(",") if s}
    oracles = {k: v for k, v in oracles.items() if k not in skip}
    # warmup
    for name, sql in sorted(oracles.items()):
        con.execute(sql).fetchall()
    results = {}
    # min-of-3, mirroring graft.Bench (one contended pass is recoverable)
    for _ in range(3):
        for name, sql in sorted(oracles.items()):
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            results[name] = min(results.get(name, 1e9), dt)
    if as_json:
        print(json.dumps({"total": round(sum(results.values()), 4),
                          "n": len(results),
                          "queries": {k: round(v, 4) for k, v in sorted(results.items())}}))
        return
    for name, dt in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{name:28s} {dt:.3f}")
    print(f"TOTAL {sum(results.values()):.3f}  n={len(results)}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], "--json" in sys.argv[3:])
