#!/usr/bin/env python3
"""Fuzz the SHIPPED t_unigram_cost oracle SQL (the position-unrolled
chained-CTE Viterbi DP) against an independent Python reference on
adversarial corpora: words built from overlapping vocab grams (DP vs
greedy divergence), equal-cost tie-breaks, OOV characters (Big
fallback), words at/over the MaxLen cliff, and unicode (code-point
positions).

Usage: python3 scripts/fuzz_unigram_oracle.py <verifyOutDir> [trials]
"""
import json
import random
import re
import sys

import duckdb

MAX_LEN = 30
BIG = 1000000000
BYTE_COST = 1000000
MAX_GRAM = 4
TOP_V = 200
PLANT = " µω€𝄞 qµz"


def nbytes(ch):
    return len(ch.encode("utf-8"))


def toks(s):
    return [w for w in re.split(r"\s+", s.strip().lower()) if w]


def ref_unigram(docs, byte_fallback=False):
    census = {}
    for _, t in docs:
        for w in toks(t):
            census[w] = census.get(w, 0) + 1
    gfreq = {}
    for w, f in census.items():
        cps = list(w)  # python strings are code points already
        for l in range(1, MAX_GRAM + 1):
            for s in range(0, len(cps) - l + 1):
                g = "".join(cps[s:s + l])
                gfreq[g] = gfreq.get(g, 0) + f
    top = sorted(gfreq.items(), key=lambda x: (-x[1], x[0]))[:TOP_V]
    if not top:
        return {}
    fmax = max(f for _, f in top)
    costs = {g: 1 + fmax // f for g, f in top}

    def viterbi(w):
        cps = list(w)
        n = len(cps)
        if n > MAX_LEN:
            if byte_fallback:
                b = sum(nbytes(c) for c in cps)
                return b * BYTE_COST, b
            return n * BIG, n
        d = [None] * (n + 1)
        d[0] = 0
        for j in range(1, n + 1):
            best = None
            for l in range(1, min(MAX_GRAM, j) + 1):
                if d[j - l] is None:
                    continue
                g = "".join(cps[j - l:j])
                if g in costs:
                    inc = costs[g] * 1024 + 1
                elif l == 1:
                    if byte_fallback:
                        nb = nbytes(cps[j - 1])
                        inc = nb * BYTE_COST * 1024 + nb
                    else:
                        inc = BIG * 1024 + 1
                else:
                    continue
                cand = d[j - l] + inc
                if best is None or cand < best:
                    best = cand
            d[j] = best
        return d[n] // 1024, d[n] % 1024

    seg = {w: viterbi(w) for w in census}
    out = {}
    for did, t in docs:
        ws = toks(t)
        if not ws:
            continue
        out[did] = (len(ws), sum(seg[w][0] for w in ws),
                    sum(seg[w][1] for w in ws))
    return out


def main():
    out_dir = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    sqls = json.load(open(f"{out_dir}/oracle_sql.json"))
    sql = sqls["t_unigram_cost"]
    sql_bytes = sqls.get("t_unigram_bytes")

    random.seed(23)
    fails = 0
    for trial in range(trials):
        vocab = random.choice([
            # overlapping grams: greedy != DP on e.g. "aab" with ab hot
            ["aab", "ab", "aa", "a", "b", "baba", "abab"],
            # tie-bait: every piece equally hot
            ["xy", "yz", "x", "y", "z", "xyz"],
            # OOV-heavy + digits
            ["q9", "99", "q", "#", "~"],
            # unicode: multi-byte code points, emoji surrogate pairs
            ["été", "é", "t", "\U0001F600", "中文"],
        ])
        def word():
            if random.random() < 0.1:
                # MaxLen cliff: 29..32 chars
                return "".join(random.choices("ab", k=random.randint(29, 32)))
            return "".join(random.choices(vocab, k=random.randint(1, 4)))
        docs = [(i, " ".join(word() for _ in range(random.randint(0, 8))))
                for i in range(random.randint(3, 70))]
        con = duckdb.connect()
        con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES " +
                    ",".join("(%d, '%s')" % (i, d.replace("'", "''"))
                             for i, d in docs) + ") t(doc_id, text)")
        # the gate slices doc_id % 3 = 1
        want = ref_unigram([d for d in docs if d[0] % 3 == 1])
        got = {r[0]: (r[1], r[2], r[3]) for r in con.sql(sql).fetchall()}
        if got != want:
            fails += 1
            diff = {k for k in set(got) | set(want) if got.get(k) != want.get(k)}
            print(f"MISMATCH trial {trial}: docs={docs}")
            print(f"  diff on {sorted(diff)[:5]}: "
                  f"got {[got.get(k) for k in sorted(diff)[:5]]} "
                  f"want {[want.get(k) for k in sorted(diff)[:5]]}")
        if sql_bytes:
            # the bytes gate slices doc_id % 10 = 4 and plants OOV
            # glyphs on doc_id % 31 = 0 (textExpr applies pre-slice)
            docs_b = [(i, t + (PLANT if i % 31 == 0 else ""))
                      for i, t in docs if i % 10 == 4]
            want_b = ref_unigram(docs_b, byte_fallback=True)
            got_b = {r[0]: (r[1], r[2], r[3])
                     for r in con.sql(sql_bytes).fetchall()}
            if got_b != want_b:
                fails += 1
                diff = {k for k in set(got_b) | set(want_b)
                        if got_b.get(k) != want_b.get(k)}
                print(f"BYTES MISMATCH trial {trial}: docs={docs}")
                print(f"  diff on {sorted(diff)[:5]}: "
                      f"got {[got_b.get(k) for k in sorted(diff)[:5]]} "
                      f"want {[want_b.get(k) for k in sorted(diff)[:5]]}")
    print(f"trials={trials} fails={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
