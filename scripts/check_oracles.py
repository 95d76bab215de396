#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each
SparkEntry.oracleSql in DuckDB over the testdata parquet tables and
compare against the parquet written by `graft.Verify`.

Usage: python3 scripts/check_oracles.py <sfDir> <verifyOutDir>
"""
import decimal
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            # relations: columns/types come from the PLAN (DB-API
            # description type_codes are generic 'NUMBER' strings and
            # can't distinguish DECIMAL from DOUBLE), and each query
            # executes exactly once (fetchall)
            want_rel = con.sql(sql)
            want_cols = list(want_rel.columns)
            want_types = [str(t) for t in want_rel.types]
            want = want_rel.fetchall()
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = list(got_rel.columns)
            got_types = [str(t) for t in got_rel.types]
            got = got_rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        # DECIMAL final outputs hash-mismatch under the driver's gate even
        # when values are equal (physical representation differs between
        # Spark parquet decimal and DuckDB native decimal) — hard FAIL so
        # this replica stays predictive of the driver. See VERDICT.md r1.
        # Detect from declared result types, not row values: a NULL
        # first row (rollup grand total) or an empty result would
        # otherwise let a decimal column slip past this guard.
        dec_cols = sorted(
            {want_cols[i] for i, t in enumerate(want_types) if "DECIMAL" in t.upper()} |
            {got_cols[i] for i, t in enumerate(got_types) if "DECIMAL" in t.upper()} |
            {want_cols[i] for r in want for i, v in enumerate(r)
             if isinstance(v, decimal.Decimal)} |
            {got_cols[i] for r in got for i, v in enumerate(r)
             if isinstance(v, decimal.Decimal)})
        if dec_cols:
            print(f"FAIL {name}: DECIMAL output columns {dec_cols} "
                  "(driver hash gate rejects decimal outputs; cast to DOUBLE)")
            n_fail += 1
            continue
        # Same class of silent divergence: DuckDB widths Spark parquet
        # cannot emit (HUGEINT from SUM(BIGINT) promotion, UHUGEINT,
        # and the unsigned ints). Python ints compare equal across
        # widths, but the driver's hash is type-sensitive — hard FAIL
        # so the replica stays predictive. See VERDICT.md r14 item 1.
        BAD_WIDTHS = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER",
                      "USMALLINT", "UTINYINT")
        wide_cols = sorted(
            {want_cols[i] for i, t in enumerate(want_types)
             if any(b in t.upper() for b in BAD_WIDTHS)})
        if wide_cols:
            print(f"FAIL {name}: oracle columns {wide_cols} have a width "
                  "Spark parquet can't emit (HUGEINT/unsigned); CAST to "
                  "BIGINT in the oracle SQL")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing values
        wi = sorted(range(len(want_cols)), key=lambda i: want_cols[i])
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(want_cols)}")
            n_fail += 1
            continue
        w = [tuple(norm(r[i]) for i in wi) for r in want]
        g = [tuple(norm(r[i]) for i in gi) for r in got]
        if len(w) != len(g):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        if sorted(map(repr, w)) != sorted(map(repr, g)):
            bad = [(a, b) for a, b in zip(sorted(map(repr, w)), sorted(map(repr, g))) if a != b]
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: {bad[0]}")
            n_fail += 1
            continue
        ordered = w == g
        print(f"PASS {name}: {len(w)} rows (ordered_match={ordered})")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
