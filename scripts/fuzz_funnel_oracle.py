#!/usr/bin/env python3
"""Fuzz the SHIPPED st_funnel oracle SQL (the chained-min recurrence)
against an independent greedy state-machine reference on adversarial
event logs: same-ms ties, duplicate steps, skipped steps, step events
before step 1, interleaved non-step noise, multi-user interleave.

The streaming side (funnelStream) advances a per-user state machine
over (ts, event_id)-sorted FINAL events with strict (>) step ordering;
the oracle claims this equals t1 = min(ms of step1),
t2 = min(ms of step2 with ms > t1), ... . The reference here IS the
state machine, so a mismatch means the chained-min reformulation is
wrong in general even if the real-data gate passes.

Usage: python3 scripts/fuzz_funnel_oracle.py <verifyOutDir> [trials]
"""
import json
import random
import sys

import duckdb

STEPS = ["signup", "click", "purchase"]


def ref_funnel(events):
    """events: (user_id, ms, event_id, event_type) -> rows
    (user_id, step_idx, step, ms) via the greedy state machine."""
    out = []
    by_user = {}
    for u, ms, eid, et in events:
        by_user.setdefault(u, []).append((ms, eid, et))
    for u, evs in by_user.items():
        times = []
        for ms, _eid, et in sorted(evs):
            nxt = len(times)
            if nxt < len(STEPS) and et == STEPS[nxt] and \
                    (not times or ms > times[-1]):
                times.append(ms)
                out.append((u, nxt + 1, STEPS[nxt], ms))
    return sorted(out)


def main():
    out_dir = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 80
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))["st_funnel"]

    random.seed(41)
    fails = 0
    for trial in range(trials):
        n_users = random.randint(1, 8)
        events = []
        eid = 0
        for u in range(n_users):
            uid = u * 10  # the gate slices user_id % 10 = 0
            for _ in range(random.randint(0, 12)):
                eid += 1
                # heavy tie pressure: tiny ms universe
                ms = random.randint(0, 6) * 1000
                et = random.choice(STEPS + ["view", "scroll"])
                events.append((uid, ms, eid, et))
        # non-sliced users must be ignored by the oracle's WHERE
        events.append((3, 0, 99999, "signup"))
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE events AS SELECT * FROM (VALUES " +
            ",".join(
                "(%d, make_timestamp(%d), %d, '%s', 0.0, '')"
                % (u, ms * 1000, e, t) for u, ms, e, t in events) +
            ") t(user_id, ts, event_id, event_type, value, props)")
        want = ref_funnel([e for e in events if e[0] % 10 == 0])
        got = sorted(
            (r[0], r[1], r[2], int(r[3].timestamp() * 1000))
            for r in con.sql(sql).fetchall())
        if got != want:
            fails += 1
            print(f"MISMATCH trial {trial}: events={events}")
            print(f"  got  {got}")
            print(f"  want {want}")
    print(f"trials={trials} fails={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
