#!/usr/bin/env python3
"""Fuzz the SHIPPED BPE oracle SQL against an independent sequential
reference implementation of the trainer.

The gates only prove Spark ≡ oracle on the driver's testdata; this
script proves the oracle itself implements greedy BPE on adversarial
corpora (tight alphabets, same-symbol runs, delimiter-looking chars).
It caught a real bug in round 12: the original space-joined
replace-to-fixed-point formulation diverged from greedy on runs
('a a a a a a' -> 'aa a aa a' instead of 'aa aa aa') while passing
every real-data gate.

Usage: python3 scripts/fuzz_bpe_oracle.py <verifyOutDir> [trials]
  <verifyOutDir> must contain oracle_sql.json (written by graft.Verify).
"""
import json
import random
import re
import sys
from collections import Counter

import duckdb

K = 8  # must match the gates' numMerges
MIN_FREQ = 2


def py_train(docs, k):
    """Sequential reference: census -> k rounds of (freq-weighted
    adjacent pair counts; argmax by (n desc, lhs, rhs); greedy
    left-to-right merge; stop under MIN_FREQ)."""
    census = Counter(w for d in docs
                     for w in re.split(r"\s+", d.strip().lower()) if w)
    seg = {w: list(w) for w in census}
    merges = []
    for _ in range(k):
        pc = Counter()
        for w, syms in seg.items():
            for j in range(len(syms) - 1):
                pc[(syms[j], syms[j + 1])] += census[w]
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < MIN_FREQ:
            break
        merges.append((a, b, n))
        for w in seg:
            out = []
            for x in seg[w]:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            seg[w] = out
    return merges, {w: " ".join(s) for w, s in seg.items()}


def py_encode(docs20, segmap):
    out = {}
    for did, txt in docs20:
        ns = no = 0
        for w in re.split(r"\s+", txt.strip().lower()):
            if not w:
                continue
            if w in segmap:
                ns += len(segmap[w].split(" "))
            else:
                ns += len(w)
                no += 1
        out[did] = (ns, no)
    return out


def main():
    out_dir = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    merges_sql = oracles["t_bpe_merges"]
    segment_sql = oracles["t_bpe_segment"]
    encode_sql = oracles["t_bpe_encode"]

    random.seed(1234)
    fails = 0
    for trial in range(trials):
        # adversarial vocabulary: tight alphabet (forces runs and
        # ties) plus chars that look like delimiters/quotes
        alpha = random.choice(["aab", "ab<>", "aa.b'", "xyz"])
        words = ["".join(random.choice(alpha) for _ in range(random.randint(1, 9)))
                 for _ in range(random.randint(1, 14))]
        # the gates read doc_id % 10 = 0 (census) and % 20 = 0 (encode)
        docs = [(i * 10, " ".join(random.choices(words, k=random.randint(1, 8))))
                for i in range(random.randint(1, 6))]
        con = duckdb.connect()
        con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES " +
                    ",".join("(%d, '%s')" % (i, d.replace("'", "''"))
                             for i, d in docs) + ") t(doc_id, text)")
        want_m, want_s = py_train([d for _, d in docs], K)
        want_m = [(i + 1, a, b, n) for i, (a, b, n) in enumerate(want_m)]
        got_m = [tuple(r) for r in con.sql(merges_sql).fetchall()]
        got_s = dict(con.sql(segment_sql).fetchall())
        want_e = py_encode([(i, d) for i, d in docs if i % 20 == 0], want_s)
        got_e = {r[0]: (r[1], r[2]) for r in con.sql(encode_sql).fetchall()}
        if got_m != want_m or got_s != want_s or got_e != want_e:
            fails += 1
            print(f"MISMATCH trial {trial}: docs={docs}")
            print(f"  merges got  {got_m}\n  merges want {want_m}")
            print(f"  seg got  {got_s}\n  seg want {want_s}")
            print(f"  enc got  {got_e}\n  enc want {want_e}")
    print(f"trials={trials} fails={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
