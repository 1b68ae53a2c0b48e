"""Headline benchmark: RHO-style radix join on the reference workload.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload matches the reference's headline row (BASELINE.md): R⋈S =
100 MB⋈400 MB = 13.1M⋈52.4M (u32 key, u32 payload) tuples, dense-PK R,
tiled-FK S; baseline RHO native 16-thread = 1491 M input-rows/s.
Throughput contract identical: (|R|+|S|) / join_seconds / 1e6.

Extra fields record secondary configs (128M⋈128M, scan GB/s) without
breaking the one-line contract.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_RHO_MROWS = 1491.0


def _bench_call(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    small = os.environ.get("BENCH_SMALL") == "1"
    nr = (1 << 17) if small else 13_107_200  # 100 MB of 8-byte tuples
    ns = (1 << 19) if small else 52_428_800  # 400 MB

    from aqp_tpu.data import create_relation_pk, create_relation_fk
    from aqp_tpu.engine import rho_join_count  # fused fast path

    relR = create_relation_pk(nr, seed=11111)
    relS = create_relation_fk(ns, nr, seed=22222)
    jax.block_until_ready((relR.key, relS.key))

    t, out = _bench_call(rho_join_count, relR.key, relR.payload, relS.key, relS.payload)
    matches = int(out.matches)
    assert matches == ns, f"wrong join cardinality: {matches} != {ns}"
    mrows = (nr + ns) / t / 1e6

    extras = {}
    # secondary: predicate scan bandwidth (vs 113.7 GB/s 16-thread reference)
    try:
        from aqp_tpu.ops.scan import scan_count

        n_scan = (1 << 20) if small else (1 << 28)
        col = jnp.arange(n_scan, dtype=jnp.int32) & 255
        col = col.astype(jnp.uint8) if hasattr(col, "astype") else col
        ts, _ = _bench_call(lambda c: scan_count(c, 32, 96), col)
        extras["scan_gbs"] = round(n_scan * col.dtype.itemsize / ts / 1e9, 2)
        extras["scan_vs_baseline"] = round(extras["scan_gbs"] / 113.7, 3)
    except Exception as e:  # pragma: no cover
        extras["scan_error"] = str(e)[:120]

    line = {
        "metric": "RHO join throughput (13.1M x 52.4M, 1 chip)",
        "value": round(mrows, 1),
        "unit": "M rows/s",
        "vs_baseline": round(mrows / BASELINE_RHO_MROWS, 3),
        "join_seconds": round(t, 4),
        "matches": matches,
        **extras,
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
