"""RHO per-phase breakdown (data/RHO-phases.csv analog).

Reference: the paper's RHO-phases study times partition/build/probe
separately (radix_join.cpp print_timing).  Here two plan forms:
  staged — the dispatcher path with per-phase jit boundaries (host-timed
           phases, the reference's timer contract);
  fused  — the Pallas pipeline's internal split measured by running K1,
           K1+K2, and the full program separately (kernel-boundary timing:
           a fused program has no host-visible phase boundaries).
Writes results/rho-phases.csv.
Usage: python experiments/rho_phases.py [--small]
"""
import sys
import time

sys.path.insert(0, ".")

from aqp_tpu.utils import ensure_platform_from_env, hard_sync

ensure_platform_from_env()

import jax

from aqp_tpu.data import create_relation_fk, create_relation_pk


def timeit(f, *args, reps=5):
    out = f(*args)
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    hard_sync(out)
    return (time.perf_counter() - t0) / reps


def main(small=False):
    nr, ns = ((1 << 16, 1 << 18) if small else (13_107_200, 52_428_800))
    relR = create_relation_pk(nr, seed=555)
    relS = create_relation_fk(ns, nr, seed=777)
    rk, rp, sk, sp = relR.key, relR.payload, relS.key, relS.payload
    hard_sync((rk, sk))
    rows = []

    # staged dispatcher phases (host timers around jit boundaries)
    from aqp_tpu.joins.api import run_join

    run_join(relR, relS, "RHO")  # warmup
    for rep in range(3):
        _, t = run_join(relR, relS, "RHO")
        for phase, secs in t.phases.items():
            rows.append(("staged", phase, rep, round(secs, 6)))

    if jax.devices()[0].platform != "cpu":
        # fused pipeline split: K1 / K1+K2 / full (keys-only count)
        from aqp_tpu.ops.pallas.rho3 import (
            HASH_C, Rho3Params, _partition_2level, rho_join_count_v3)
        import jax.numpy as jnp

        prm = Rho3Params()

        @jax.jit
        def k12(rk, rp, sk, sp):
            k2, p2, nbg, ovf, alias = _partition_2level(
                rk, rp, sk, sp, prm, HASH_C, False, with_payload=False)
            return ovf + k2[0, 0, 0, 0, 0]

        @jax.jit
        def full(rk, rp, sk, sp):
            m, c, o = rho_join_count_v3(rk, rp, sk, sp,
                                        with_checksum=False)
            return m + o

        t12 = timeit(k12, rk, rp, sk, sp)
        tf = timeit(full, rk, rp, sk, sp)
        for rep in range(1):
            rows.append(("fused", "partition_k1k2", rep, round(t12, 6)))
            rows.append(("fused", "join_k3", rep, round(max(0.0, tf - t12), 6)))
            rows.append(("fused", "total", rep, round(tf, 6)))

    import os

    os.makedirs("results", exist_ok=True)
    with open("results/rho-phases.csv", "w") as f:
        f.write("plan,phase,rep,seconds\n")
        for r in rows:
            f.write(",".join(map(str, r)) + "\n")
    print(f"wrote results/rho-phases.csv ({len(rows)} rows)")


if __name__ == "__main__":
    main(small="--small" in sys.argv)
