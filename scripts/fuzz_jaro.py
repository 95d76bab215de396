#!/usr/bin/env python3
"""Fuzz the JaroWinklerAlgo semantics (replicated here in IEEE-double
Python, op order identical to the Scala) against DuckDB's native
jaro_winkler_similarity — the oracle the f_jaro_winkler gate hashes
raw doubles against. Alphabets include multi-byte unicode (byte
semantics!) and high-collision binary strings up to length 250.

Usage: python3 scripts/fuzz_jaro.py [trials_per_alphabet]
"""
import random
import sys

import duckdb


def jaro(s, t):
    ls, lt = len(s), len(t)
    if ls == 0 or lt == 0:
        return 0.0
    window = max(ls, lt) // 2 - 1
    if window < 0:
        window = 0
    sm = [False] * ls
    tm = [False] * lt
    m = 0
    for i in range(ls):
        lo = max(0, i - window)
        hi = min(lt - 1, i + window)
        for j in range(lo, hi + 1):
            if not tm[j] and s[i] == t[j]:
                sm[i] = True
                tm[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    k = 0
    trans = 0
    for i in range(ls):
        if sm[i]:
            while not tm[k]:
                k += 1
            if s[i] != t[k]:
                trans += 1
            k += 1
    half = trans // 2
    return (m / ls + m / lt + (m - half) / m) / 3.0


def jw(s, t):
    sim = jaro(s, t)
    if sim > 0.7:
        l = 0
        for a, b in zip(s[:4], t[:4]):
            if a == b:
                l += 1
            else:
                break
        sim = sim + l * 0.1 * (1.0 - sim)
    return sim


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    con = duckdb.connect()
    alphabets = [
        ("mixed-unicode", "abcdeé 日本xyz", (0, 12)),
        ("binary-long", "ab", (0, 250)),
        ("ascii-short", "abcdefgh", (0, 6)),
    ]
    random.seed(7)
    fails = 0
    for name, alpha, (lo, hi) in alphabets:
        for _ in range(trials):
            a = "".join(random.choice(alpha) for _ in range(random.randint(lo, hi)))
            b = "".join(random.choice(alpha) for _ in range(random.randint(lo, hi)))
            mine = jw(a.encode(), b.encode())
            got = con.execute(
                "SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
            if mine != got:
                fails += 1
                if fails < 6:
                    print(f"MISMATCH [{name}] {a!r} {b!r}: {mine} != {got}")
    print(f"alphabets={len(alphabets)} trials_each={trials} fails={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
