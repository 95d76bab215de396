#!/usr/bin/env python3
"""Fuzz the SHIPPED bootstrap oracle SQL (p_bootstrap_means, row unit;
p_bootstrap_cluster, source-cluster unit) against an independent
Python reference of the deterministic Poisson-weight arithmetic.

The weight key is built by string concatenation on both engines
(Spark `concat(b, ':', id)` vs DuckDB `'' || b || ':' || CAST(id AS
VARCHAR)`) — the string-boundary class the jaro fuzzer caught in
round 13 — so the corpora here are adversarial KEY populations:
cluster names containing ':' '|' and quotes, unicode, empty strings,
huge and negative integer ids, duplicate ids, single-cluster and
one-row corpora. The real-data gates can pass while the key
construction is wrong in general (e.g. a delimiter that aliases
(b, id) pairs); a reference that recomputes md5 over the EXACT
intended key string catches that.

Usage: python3 scripts/fuzz_bootstrap_oracle.py <verifyOutDir> [trials]
"""
import hashlib
import json
import math
import random
import sys

import duckdb

# floor(P(Poisson(1) <= k) * 1e6), k = 0..8 — the driver-computed
# literal table both engines splice (Bootstrap.PoisCum)
POIS = []
_c, _p = 0.0, math.exp(-1.0)
for _k in range(9):
    _c += _p
    POIS.append(math.floor(_c * 1e6))
    _p /= (_k + 1)


def bucket(key, seed):
    h = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:15]
    return int(h, 16) % 1000000


def weight(key, b, seed):
    u = bucket(f"{b}:{key}", seed)
    for k, cum in enumerate(POIS):
        if u < cum:
            return k
    return len(POIS)


def ref_resample(rows, key_of, x_of, n_resamples, seed):
    out = []
    for b in range(n_resamples):
        n_eff = sum(weight(key_of(r), b, seed) for r in rows)
        sum_wx = sum(weight(key_of(r), b, seed) * x_of(r) for r in rows)
        # non-negative sums by the operator's contract, so DuckDB's
        # floor `//` and Spark's truncating `div` agree
        out.append((b, n_eff, sum_wx, (sum_wx * 1000000) // max(n_eff, 1)))
    return out


ADVERSARIAL_SOURCES = [
    "", "a", "a:b", "1:2", "12:", ":", "x|y", "a'b", 'a"b',
    "naïve", "☃snow", "common-crawl", "0", "00", " lead", "trail ",
    "a||b", "b:7:c", "-1", "漢字",
]


def main():
    out_dir = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    means_sql = oracles["p_bootstrap_means"]      # key doc_id, x n_chars, seed 42
    cluster_sql = oracles["p_bootstrap_cluster"]  # key source, x n_chars, seed 7

    random.seed(43)
    fails = 0
    for trial in range(trials):
        n = random.choice([1, 2, 5, 17, 40])
        rows = []
        used = set()
        for i in range(n):
            if random.random() < 0.2:
                doc_id = random.choice([0, 1, -5, -(10 ** 17), 10 ** 17])
            else:
                doc_id = random.randint(-1000, 10 ** 9)
            # duplicate ids on purpose sometimes (row-bootstrap weights
            # are per-row FUNCTIONS of the id — duplicates share one)
            if doc_id in used and random.random() < 0.5:
                doc_id += i + 1
            used.add(doc_id)
            source = random.choice(ADVERSARIAL_SOURCES)
            n_chars = random.randint(0, 5000)
            rows.append((doc_id, source, n_chars))

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents (doc_id BIGINT, source VARCHAR, n_chars BIGINT)")
        con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)

        got_m = [tuple(r) for r in con.execute(means_sql).fetchall()]
        want_m = ref_resample(rows, lambda r: str(r[0]), lambda r: r[2], 32, 42)
        got_c = [tuple(r) for r in con.execute(cluster_sql).fetchall()]
        want_c = ref_resample(rows, lambda r: r[1], lambda r: r[2], 32, 7)
        con.close()

        for name, got, want in (("means", got_m, want_m),
                                ("cluster", got_c, want_c)):
            if got != want:
                fails += 1
                diff = [(g, w) for g, w in zip(got, want) if g != w][:3]
                print(f"FAIL trial {trial} {name}: first diffs {diff}")
                break

    print(f"{trials - fails}/{trials} trials matched")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
