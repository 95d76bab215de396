#!/usr/bin/env python3
"""Fuzz the SHIPPED t_wordpiece / t_wordpiece_stats oracle SQL (the
recursive-CTE + LATERAL longest-match reformulation) against an
independent Python greedy reference on adversarial corpora: words
that force multi-piece continuation chains, punctuation (UNK path),
digits, words that ARE vocab prefixes of each other, and repeated
words (census vs occurrence counting).

Usage: python3 scripts/fuzz_wordpiece_oracle.py <verifyOutDir> [trials]
"""
import json
import random
import re
import sys

import duckdb

CHARS = set("abcdefghijklmnopqrstuvwxyz0123456789")


def toks(s):
    return [w for w in re.split(r"\s+", s.strip().lower()) if w]


def segment_word(word, start, cont):
    out = []
    pos = 0
    n = len(word)
    while pos < n:
        pieces = start if pos == 0 else cont
        hit = 0
        for l in range(n - pos, 0, -1):
            if word[pos:pos + l] in pieces:
                hit = l
                break
        if hit == 0:
            return "[UNK]", True
        out.append(word[pos:pos + hit] if pos == 0 else "##" + word[pos:pos + hit])
        pos += hit
    return " ".join(out), False


def ref_wordpiece(docs, vocab_docs, top_n):
    census = {}
    for _, t in docs:
        for w in toks(t):
            census[w] = census.get(w, 0) + 1
    vcensus = {}
    for _, t in vocab_docs:
        for w in toks(t):
            vcensus[w] = vcensus.get(w, 0) + 1
    top = [w for w, _ in sorted(
        ((w, c) for w, c in vcensus.items() if not w.startswith("##")),
        key=lambda x: (-x[1], x[0]))[:top_n]]
    start = set(top) | CHARS
    cont = CHARS
    return {w: segment_word(w, start, cont) for w in census}


def ref_stats(docs, seg):
    out = {}
    for did, t in docs:
        ws = toks(t)
        if not ws:
            continue
        n_sub = sum(1 if seg[w][1] else len(seg[w][0].split(" ")) for w in ws)
        n_unk = sum(1 for w in ws if seg[w][1])
        out[did] = (len(ws), n_sub, n_unk)
    return out


def main():
    out_dir = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    wp_sql = oracles["t_wordpiece"]
    st_sql = oracles["t_wordpiece_stats"]

    random.seed(17)
    fails = 0
    for trial in range(trials):
        vocab = random.choice([
            ["cat", "cats", "catalog", "dog", "do", "og"],
            ["a", "ab", "abc", "abcd", "x,", "q!"],
            ["the", "them", "theme", "zz9", "90s", "--"],
        ])
        def word():
            return random.choice(vocab + ["".join(random.choices("abcz0,!", k=random.randint(1, 6)))])
        docs = [(i, " ".join(word() for _ in range(random.randint(0, 10))))
                for i in range(random.randint(3, 30))]
        con = duckdb.connect()
        con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES " +
                    ",".join("(%d, '%s')" % (i, d.replace("'", "''"))
                             for i, d in docs) + ") t(doc_id, text)")
        # t_wordpiece gate: census+vocab both %5=0, topN=8
        s5 = [d for d in docs if d[0] % 5 == 0]
        want_wp = ref_wordpiece(s5, s5, 8)
        got_wp = {r[0]: (r[1], r[2]) for r in con.sql(wp_sql).fetchall()}
        # t_wordpiece_stats: census %10=1, vocab %5=0, topN=8
        s10 = [d for d in docs if d[0] % 10 == 1]
        seg = ref_wordpiece(s10, s5, 8)
        want_st = ref_stats(s10, seg)
        got_st = {r[0]: (r[1], r[2], r[3]) for r in con.sql(st_sql).fetchall()}
        if got_wp != want_wp or got_st != want_st:
            fails += 1
            print(f"MISMATCH trial {trial}: docs={docs}")
            if got_wp != want_wp:
                diff = {k for k in set(got_wp) | set(want_wp)
                        if got_wp.get(k) != want_wp.get(k)}
                print(f"  wp diff on {sorted(diff)[:5]}: "
                      f"got {[got_wp.get(k) for k in sorted(diff)[:5]]} "
                      f"want {[want_wp.get(k) for k in sorted(diff)[:5]]}")
            if got_st != want_st:
                print(f"  st got  {got_st}\n  st want {want_st}")
    print(f"trials={trials} fails={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
