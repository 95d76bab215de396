#!/usr/bin/env python3
"""Fuzz the SHIPPED f_hilbert_key oracle SQL (the unrolled-CTE
Hilbert fold, executed by DuckDB) against an INDEPENDENT check: the
inverse curve walk d2xy — a different loop (base-case-up, per-level
rot(s)) — must map every returned index back to the input cell, and
the indexes of one trial must be pairwise distinct (injectivity).
This is the DuckDB-side twin of HilbertIndexSpec's bijection proof
(which executes the same SQL text in Spark).

The oracle reads `lineitem(l_orderkey, l_linenumber, l_partkey,
l_suppkey)` with an orderkey % 100 = 0 slice and 1024-masked keys;
the harness materializes adversarial grids per trial: corners, the
mask boundary (1023/1024/1025), quadrant seams (511/512), and random
cells.

Usage: python3 scripts/fuzz_hilbert_oracle.py <verifyOutDir> [trials]
"""
import json
import random
import sys

import duckdb

BITS = 10
N = 1 << BITS


def d2xy(d):
    x = y = 0
    t = d
    s = 1
    while s < N:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def main():
    out_dir = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))["f_hilbert_key"]

    edge = [0, 1, 511, 512, 513, 1022, 1023, 1024, 1025, 2047]
    random.seed(59)
    fails = 0
    for trial in range(trials):
        cells = [(random.choice(edge + [random.randint(0, 4000)]),
                  random.choice(edge + [random.randint(0, 4000)]))
                 for _ in range(random.randint(1, 120))]
        rows = [(100 * (i + 1), i, p, s) for i, (p, s) in enumerate(cells)]
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE lineitem AS SELECT * FROM (VALUES " +
            ",".join(f"({ok}, {ln}, {p}, {s})" for ok, ln, p, s in rows) +
            ") t(l_orderkey, l_linenumber, l_partkey, l_suppkey)")
        got = con.sql(sql).fetchall()
        bad = []
        for ok, ln, hkey in got:
            p, s = cells[ln]
            if d2xy(hkey) != (p % N, s % N):
                bad.append((p, s, hkey, d2xy(hkey)))
        # injectivity over the trial's DISTINCT masked cells
        masked = {(p % N, s % N) for p, s in cells}
        if len({h for _, _, h in got
                if True}) < len(masked) and not bad:
            # distinct cells must get distinct indexes
            seen = {}
            for ok, ln, hkey in got:
                cell = (cells[ln][0] % N, cells[ln][1] % N)
                if hkey in seen and seen[hkey] != cell:
                    bad.append(("collision", cell, hkey, seen[hkey]))
                seen[hkey] = cell
        if bad:
            fails += 1
            print(f"MISMATCH trial {trial}: {bad[:4]}")
        con.close()
    print(f"trials={trials} fails={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
