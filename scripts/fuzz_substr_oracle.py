#!/usr/bin/env python3
"""Fuzz the SHIPPED ExactSubstr oracle SQL (d_substr_runs /
d_substr_apply) against an independent char-level reference.

The gates only prove Spark ≡ oracle on the driver's testdata; this
script proves the oracle itself implements maximal-shared-run
detection and span cutting on adversarial corpora: periodic text
(many overlapping diagonals), tight alphabets (anchor collisions by
construction), fully-covered documents, runs touching string ends,
and quote-looking characters.

Reference formulation is deliberately different from the SQL: a
maximal anchor island on a diagonal is exactly a maximal run of
equal characters of length >= k at that alignment, so the reference
scans characters pairwise and never builds anchors at all.

Usage: python3 scripts/fuzz_substr_oracle.py <verifyOutDir> [trials]
  <verifyOutDir> must contain oracle_sql.json (written by graft.Verify).
"""
import json
import random
import sys

import duckdb

K = 20       # must match the gates' k
MIN_LEN = 30  # must match the gates' minLen
SELF_K, SELF_MIN_LEN = 12, 16  # the d_substr_self gate's params


def ref_runs(rows, k, min_len):
    """Maximal equal-char runs >= max(k, min_len) per pair/diagonal."""
    out = set()
    for ida, ta in rows:
        for idb, tb in rows:
            if not ida < idb:
                continue
            for d in range(-(len(tb) - 1), len(ta)):
                i = max(0, d)
                end = min(len(ta), len(tb) + d)
                while i < end:
                    if ta[i] == tb[i - d]:
                        j = i
                        while j < end and ta[j] == tb[j - d]:
                            j += 1
                        if j - i >= k and j - i >= min_len:
                            out.add((ida, idb, i + 1, i - d + 1, j - i))
                        i = j
                    else:
                        i += 1
    return out


def ref_apply(rows, k, min_len):
    """Cut merged [start_b, start_b + len - 1] spans (higher id of
    each pair) out of the text."""
    spans = {}
    for _, b, _, sb, ln in ref_runs(rows, k, min_len):
        spans.setdefault(b, []).append((sb, sb + ln - 1))
    out = {}
    for did, text in rows:
        merged = []
        for lo, hi in sorted(spans.get(did, [])):
            if merged and lo <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
            else:
                merged.append((lo, hi))
        clean = "".join(c for p, c in enumerate(text, start=1)
                        if not any(lo <= p <= hi for lo, hi in merged))
        out[did] = (len(merged), len(text) - len(clean), clean)
    return out


def ref_self(rows, k, min_len):
    """Maximal runs of t[i] == t[i+d] per shift d > 0."""
    out = set()
    for did, t in rows:
        for d in range(1, len(t)):
            i = 0
            while i < len(t) - d:
                if t[i] == t[i + d]:
                    j = i
                    while j < len(t) - d and t[j] == t[j + d]:
                        j += 1
                    if j - i >= k and j - i >= min_len:
                        out.add((did, i + 1, i + 1 + d, j - i))
                    i = j
                else:
                    i += 1
    return out


def main():
    out_dir = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    runs_sql = oracles["d_substr_runs"]
    apply_sql = oracles["d_substr_apply"]
    self_sql = oracles["d_substr_self"]

    random.seed(4321)
    fails = 0
    for trial in range(trials):
        alpha = random.choice(["ab", "abc", "ab'c.", "xy",
                               "\u00e9\u00fc\u03b1", "\u65e5\u672c\u8a9eb"])  # multi-byte: substr/length must count code points
        def rand(n):
            return "".join(random.choice(alpha) for _ in range(n))
        shared = [rand(random.randint(MIN_LEN - 5, MIN_LEN + 30))
                  for _ in range(random.randint(1, 3))]
        rows = []
        # the gates read doc_id % 3 = 2; include decoys outside the slice
        for i in range(random.randint(2, 7)):
            did = 2 + 3 * i
            style = random.random()
            if style < 0.3:
                txt = rand(random.randint(5, 20)) + random.choice(shared) \
                    + rand(random.randint(0, 15))
            elif style < 0.5:
                txt = random.choice(alpha) * random.randint(MIN_LEN, 80)  # periodic
            elif style < 0.6:
                txt = random.choice(shared)  # fully covered when paired
            else:
                txt = rand(random.randint(1, 70))
            rows.append((did, txt))
        decoy = [(3 * i, rand(40)) for i in range(2)]
        con = duckdb.connect()
        con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES " +
                    ",".join("(%d, '%s')" % (i, d.replace("'", "''"))
                             for i, d in rows + decoy) + ") t(doc_id, text)")
        want_r = ref_runs(rows, K, MIN_LEN)
        got_r = {tuple(r) for r in con.sql(runs_sql).fetchall()}
        want_a = ref_apply(rows, K, MIN_LEN)
        got_a = {r[0]: (r[1], r[2], r[3]) for r in con.sql(apply_sql).fetchall()}
        # the self gate reads doc_id % 2 = 0: even-id subset of rows+decoys
        evens = [r for r in rows + decoy if r[0] % 2 == 0]
        want_s = ref_self(evens, SELF_K, SELF_MIN_LEN)
        got_s = {tuple(r) for r in con.sql(self_sql).fetchall()}
        if got_r != want_r or got_a != want_a or got_s != want_s:
            fails += 1
            print(f"MISMATCH trial {trial}: rows={rows}")
            print(f"  runs got  {sorted(got_r)}\n  runs want {sorted(want_r)}")
            print(f"  apply got  {got_a}\n  apply want {want_a}")
            print(f"  self got  {sorted(got_s)}\n  self want {sorted(want_s)}")
    print(f"trials={trials} fails={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
