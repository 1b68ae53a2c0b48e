"""Multi-query cracking amortization study (CrkJoin's core claim).

Reference: CrkJoin/JoinWrapper.cpp runs query sequences against one
progressively-cracked store — the first query pays the cracking, later
queries reuse it (the paper's motivating property).  This study measures a
sequence of Q joins on the SAME CrackedRelation pair (lazy reuse) vs
re-cracking from scratch every query, and RHO as the eager baseline.

Writes results/cracking.csv: variant,query,seconds,throughput_mrows.
Usage: python experiments/cracking.py [--small] [--queries 8]
"""

import argparse
import math
import sys
import time

sys.path.insert(0, ".")

from aqp_tpu.utils import ensure_platform_from_env, hard_sync

ensure_platform_from_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--queries", type=int, default=8)
    args = ap.parse_args()

    from aqp_tpu.config import JoinConfig
    from aqp_tpu.data import create_relation_fk, create_relation_pk
    from aqp_tpu.joins.api import run_join
    from aqp_tpu.joins.crk import crack_relation, crk_join_cracked

    nr, ns = ((1 << 16, 1 << 18) if args.small
              else (13_107_200, 52_428_800))
    relR = create_relation_pk(nr, seed=501)
    relS = create_relation_fk(ns, nr, seed=502)
    hard_sync((relR.key, relS.key))
    cfg = JoinConfig()
    depth = max(1, math.ceil(math.log2(max(2, nr / cfg.partition_rows))))
    kb = max(1, math.ceil(math.log2(max(2, nr)))) + 1
    total = nr + ns

    rows = []

    # variant 1: persistent store — cracking amortizes across the sequence
    crR, crS = crack_relation(relR, kb), crack_relation(relS, kb)
    # warmup compile on throwaway fresh stores (compile cache is shared)
    crk_join_cracked(crack_relation(relR, kb), crack_relation(relS, kb),
                     cfg, depth)
    for q in range(args.queries):
        t0 = time.perf_counter()
        out, crR, crS = crk_join_cracked(crR, crS, cfg, depth)
        hard_sync(out.matches)
        dt = time.perf_counter() - t0
        rows.append(("cracked_reuse", q, round(dt, 6),
                     round(total / dt / 1e6, 2)))
        print(f"reuse    q{q}: {dt * 1e3:8.2f} ms "
              f"({total / dt / 1e6:8.1f} M rows/s)", flush=True)

    # variant 2: re-crack from scratch every query (no reuse)
    for q in range(args.queries):
        t0 = time.perf_counter()
        out, _, _ = crk_join_cracked(
            crack_relation(relR, kb), crack_relation(relS, kb), cfg, depth)
        hard_sync(out.matches)
        dt = time.perf_counter() - t0
        rows.append(("cracked_fresh", q, round(dt, 6),
                     round(total / dt / 1e6, 2)))
        print(f"fresh    q{q}: {dt * 1e3:8.2f} ms", flush=True)

    # variant 3: eager RHO every query (the non-cracking champion)
    run_join(relR, relS, "RHO", cfg)  # warmup
    for q in range(args.queries):
        t0 = time.perf_counter()
        res, _ = run_join(relR, relS, "RHO", cfg)
        hard_sync(res.matches)
        dt = time.perf_counter() - t0
        rows.append(("rho_eager", q, round(dt, 6),
                     round(total / dt / 1e6, 2)))
        print(f"rho      q{q}: {dt * 1e3:8.2f} ms", flush=True)

    import os

    os.makedirs("results", exist_ok=True)
    with open("results/cracking.csv", "w") as f:
        f.write("variant,query,seconds,throughput_mrows\n")
        for r in rows:
            f.write(",".join(map(str, r)) + "\n")
    print(f"wrote results/cracking.csv ({len(rows)} rows)")


if __name__ == "__main__":
    main()
