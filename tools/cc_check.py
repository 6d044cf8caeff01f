#!/usr/bin/env python3
"""q56 connected-components oracle for corpora where the SQL oracle is
intractable.

The declared q56 oracle is a recursive-CTE label propagation — O(component
size x edges) in DuckDB. On realistic 10x corpora the near-dup graph
percolates into a giant component (16,658 docs on target/sf1.0), which the
engine's pointer-jumping handles in O(k log k) but the SQL recursion cannot
(~1e10 row-steps). This checker keeps the ORACLE SEMANTICS and swaps the
algorithm: candidate pairs come from the exact same shingle/minhash/band
SQL prefix as the declared oracle, components from a union-find, and the
output contract (doc_id, cluster_id = min doc_id in component,
cluster_size, is_canonical) is compared row-for-row against the engine's
parquet dump.

Usage: python3 tools/cc_check.py <sf_dir> <verify_out_dir>
"""
import glob
import json
import os
import sys

import duckdb


def main(sf_dir, out_dir):
    con = duckdb.connect()
    src = f"{sf_dir}/documents.parquet"
    if os.path.isdir(src):
        src = f"{src}/*.parquet"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{src}')")
    # candidate pairs come from the DUMPED q23 oracle, not a copied
    # literal: if the engine's minhash parameters or shingle expression
    # ever change, this check follows automatically instead of silently
    # validating against stale semantics
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    q23 = oracles["q23_dedup_minhash_lsh"]
    pairs = con.execute(
        f"SELECT doc_a, doc_b FROM ({q23}) candidate_pairs").fetchall()

    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    expected = {}
    for members in comp.values():
        cid = min(members)
        for m in members:
            expected[m] = (cid, len(members))

    files = glob.glob(f"{out_dir}/q56_dup_clusters/*.parquet")
    got = con.execute(f"SELECT * FROM read_parquet({files!r}) ORDER BY doc_id").fetchall()
    n_bad = 0
    if len(got) != len(expected):
        print(f"FAIL q56: rows {len(got)} != {len(expected)}")
        n_bad += 1
    for doc_id, cluster_id, cluster_size, is_canonical in got:
        ec, es = expected.get(doc_id, (None, None))
        if (cluster_id, cluster_size, is_canonical) != (ec, es, doc_id == ec):
            if n_bad < 5:
                print(f"FAIL q56 doc {doc_id}: got ({cluster_id},{cluster_size},"
                      f"{is_canonical}) expected ({ec},{es},{doc_id == ec})")
            n_bad += 1
    biggest = max((len(m) for m in comp.values()), default=0)
    if n_bad == 0:
        print(f"PASS q56_dup_clusters ({len(got)} rows, "
              f"{len(comp)} components, largest {biggest})")
    else:
        print(f"q56: {n_bad} mismatches")
        sys.exit(1)

    # q122 = the same components projected to non-canonical
    # (doc_a, doc_b = canonical, family_size) rows — checked from the same
    # union-find whenever its dump is present (older dumps lack it)
    q122_files = glob.glob(f"{out_dir}/q122_neardup_canonical_pairs/*.parquet")
    if q122_files:
        got122 = con.execute(
            f"SELECT * FROM read_parquet({q122_files!r}) ORDER BY doc_a"
        ).fetchall()
        exp122 = sorted((m, c, s) for m, (c, s) in expected.items() if m != c)
        n_bad = 0
        if len(got122) != len(exp122):
            print(f"FAIL q122: rows {len(got122)} != {len(exp122)}")
            n_bad += 1
        for (ga, gb, gs), (ea, eb, es) in zip(got122, exp122):
            if (ga, gb, gs) != (ea, eb, es):
                if n_bad < 5:
                    print(f"FAIL q122: got ({ga},{gb},{gs}) "
                          f"expected ({ea},{eb},{es})")
                n_bad += 1
        if n_bad == 0:
            print(f"PASS q122_neardup_canonical_pairs ({len(got122)} rows)")
        else:
            print(f"q122: {n_bad} mismatches")
            sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
