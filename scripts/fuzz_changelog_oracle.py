#!/usr/bin/env python3
"""Fuzz the SHIPPED o_changelog_apply / o_changelog_net oracle SQL
against an independent sequential per-op replay (a dict mutated one
operation at a time in seq order — the semantic definition, not the
winner-join reformulation the oracle uses). The oracles derive the
base/changelog fixture from `orders(o_orderkey, o_orderstatus,
o_totalprice)` (%3 update, %6 second update, %9 delete, %4 insert);
the harness materializes adversarial key sets per trial — dense
residue collisions (all slices firing on one key), lone keys, empty
slices.

Usage: python3 scripts/fuzz_changelog_oracle.py <verifyOutDir> [trials]
"""
import json
import random
import sys

import duckdb


def ref_replay(keys):
    """Independent: replay ops one at a time in global seq order."""
    base = {k: (s, p) for k, s, p in
            ((k, "st%d" % (k % 7), float(k) + 0.25) for k in keys)
            if k % 4 != 0}
    log = []
    for k in keys:
        p = float(k) + 0.25
        if k % 3 == 0:
            log.append((k * 10 + 1, k, "U", "U1", p * 2))
        if k % 6 == 0:
            log.append((k * 10 + 2, k, "U", "U2", p * 4))
        if k % 9 == 0:
            log.append((k * 10 + 3, k, "D", "X", 0.0))
        if k % 4 == 0:
            log.append((k * 10 + 0, k, "I", "I0", p + 1))
    snap = dict(base)
    for seq, k, op, st, pr in sorted(log):
        if op == "D":
            snap.pop(k, None)
        else:
            snap[k] = (st, pr)
    # net effect per touched key
    touched = {}
    for seq, k, op, st, pr in sorted(log):
        n, _ = touched.get(k, (0, None))
        touched[k] = (n + 1, op)
    net = {}
    for k, (n, last) in touched.items():
        in_base = k in base
        if in_base:
            net[k] = (n, last, "delete" if last == "D" else "update")
        else:
            net[k] = (n, last, "noop" if last == "D" else "insert")
    return snap, net


def main():
    out_dir = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

    random.seed(53)
    fails = 0
    for trial in range(trials):
        n_keys = random.randint(1, 40)
        # bias toward residue-rich keys (multiples of 36 hit every slice)
        keys = sorted({random.choice(
            [random.randint(1, 500),
             36 * random.randint(1, 12),
             random.randint(1, 500)]) for _ in range(n_keys)})
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE orders AS SELECT * FROM (VALUES " +
            ",".join(f"({k}, 'st{k % 7}', CAST({float(k) + 0.25!r} AS DOUBLE))"
                     for k in keys) +
            ") t(o_orderkey, o_orderstatus, o_totalprice)")
        want_snap, want_net = ref_replay(keys)

        got_snap = {r[0]: (r[1], r[2])
                    for r in con.sql(oracles["o_changelog_apply"]).fetchall()}
        got_net = {r[0]: (r[1], r[2], r[3])
                   for r in con.sql(oracles["o_changelog_net"]).fetchall()}
        if got_snap != want_snap or got_net != want_net:
            fails += 1
            print(f"MISMATCH trial {trial} keys={keys[:8]}…")
            for k in set(want_snap) | set(got_snap):
                if want_snap.get(k) != got_snap.get(k):
                    print(f"  apply k={k}: want {want_snap.get(k)} "
                          f"got {got_snap.get(k)}")
            for k in set(want_net) | set(got_net):
                if want_net.get(k) != got_net.get(k):
                    print(f"  net k={k}: want {want_net.get(k)} "
                          f"got {got_net.get(k)}")
        con.close()
    print(f"trials={trials} fails={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
