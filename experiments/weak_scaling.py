"""Weak/strong scaling over the device mesh (thread-scaling analog).

Reference: the SGXv2 paper's thread/NUMA scaling studies
(SGXv2Scripts/scripts/paper-3*, 3_numa.sh): throughput vs worker count.
TPU analog: device count over a jax.sharding.Mesh — weak scaling keeps the
PER-DEVICE workload fixed (ideal = flat time), strong scaling keeps the
TOTAL workload fixed (ideal = 1/n time).  Both the hash-shuffle join and
the overlapped ring join are measured.

On CPU (the 8-virtual-device test mesh) absolute throughput is
meaningless; the committed artifact is the SHAPE (parallel efficiency).
On a real multi-chip slice the same script measures ICI scaling.

Writes results/weak-scaling.csv.
Usage: python experiments/weak_scaling.py [--small]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from aqp_tpu.utils import ensure_platform_from_env, hard_sync

ensure_platform_from_env()

import jax

from aqp_tpu.data import create_relation_fk, create_relation_pk
from aqp_tpu.parallel.dist_join import (
    make_dist_join_count, make_dist_join_count_ring)
from aqp_tpu.parallel.mesh import make_mesh, shard_relation


def bench(fn, args, reps=3):
    out = fn(*args)
    hard_sync(out[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        hard_sync(out[0])
        best = min(best, time.perf_counter() - t0)
    return best, int(out[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    ndev = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8, 16) if n <= ndev]
    per_r, per_s = ((1 << 12, 1 << 14) if args.small
                    else (1 << 17, 1 << 19))
    rows = []
    # weak/strong: the hash-shuffle serving path's axes.  broadcast: the
    # ring's DESIGN regime — R fixed and small (it rotates in full past
    # every shard), S grows with the mesh; per-device probe work is
    # |R| log |S/n| independent of n, so the ideal is flat time = rising
    # total throughput.  On the weak axis (R grows with n) ANY broadcast
    # join does n x the shuffle's probe work by construction — that row
    # documents the crossover, not a defect.
    for mode in ("weak", "strong", "broadcast"):
        for n in counts:
            if mode == "weak":
                nr, ns = per_r * n, per_s * n
            elif mode == "strong":
                nr, ns = per_r * counts[-1], per_s * counts[-1]
            else:
                nr, ns = per_r, per_s * n
            relR = create_relation_pk(nr, seed=601)
            relS = create_relation_fk(ns, nr, seed=602)
            mesh = make_mesh(n)
            R = shard_relation(relR, mesh)
            S = shard_relation(relS, mesh)
            for eng, make in (
                ("shuffle", lambda: make_dist_join_count(
                    mesh, R.num_tuples // n, S.num_tuples // n)),
                ("ring", lambda: make_dist_join_count_ring(mesh)),
            ):
                fn = make()
                t, m = bench(fn, (R.key, R.payload, S.key, S.payload),
                             args.reps)
                assert m == ns, (eng, mode, n, m, ns)
                mrs = (nr + ns) / t / 1e6
                eff_base = next(
                    (r[5] for r in rows
                     if r[0] == mode and r[1] == 1 and r[2] == eng), None)
                print(f"{mode:6s} n={n} {eng:8s} {t * 1e3:9.2f} ms "
                      f"{mrs:9.1f} M rows/s", flush=True)
                rows.append((mode, n, eng, nr + ns, round(t, 6),
                             round(mrs, 2)))

    import os

    os.makedirs("results", exist_ok=True)
    with open("results/weak-scaling.csv", "w") as f:
        f.write("mode,devices,engine,total_rows,seconds,throughput_mrows\n")
        for r in rows:
            f.write(",".join(map(str, r)) + "\n")
    print(f"wrote results/weak-scaling.csv ({len(rows)} rows)")


if __name__ == "__main__":
    main()
