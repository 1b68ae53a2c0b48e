"""Scan microbenchmark driver — the SimdScanMulti analog.

Reference: Scan-Micro-Benchmarks/microbenchmarks/SimdScanMulti/App/App.cpp
(config spectrum: mode x size x selectivity x repeats -> CSV) with the
PerfEventBlock CSV row per configuration.  Here: one process, one chip,
amortized in-jit repetition (the environment has ~25 ms fixed dispatch
overhead per device call), bytes/s as the metric.

Usage: python experiments/scan_bench.py [--small] [--csv results/scan.csv]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from aqp_tpu.utils import ensure_platform_from_env, hard_sync

ensure_platform_from_env()


def overhead():
    tiny = jnp.zeros((8,), jnp.int32)
    f = jax.jit(lambda x: jnp.sum(x))
    hard_sync(f(tiny))
    t0 = time.perf_counter()
    for _ in range(5):
        hard_sync(f(tiny))
    return (time.perf_counter() - t0) / 5


def bench_mode(col, mode, lo, hi, oh, reps=3, use_pallas=True):
    from aqp_tpu.ops import scan as xscan

    n = col.shape[0]
    if use_pallas and jax.devices()[0].platform not in ("cpu",):
        from aqp_tpu.ops.pallas import scan as pscan

        fns = {
            "count": lambda: pscan.scan_count_pallas(col, lo, hi),
            "sum": lambda: pscan.scan_sum_pallas(col, lo, hi),
            "bitvector": lambda: pscan.scan_bitvector_pallas(col, lo, hi),
        }
    else:
        fns = {}
    fns.setdefault("count", lambda: xscan.scan_count(col, lo, hi))
    fns.setdefault("sum", lambda: xscan.scan_sum(col, lo, hi))
    fns.setdefault("bitvector", lambda: xscan.scan_bitvector(col, lo, hi))
    cap = max(8, int(n * 0.6))
    fns.setdefault("index", lambda: xscan.scan_index(col, lo, hi, cap))
    fns.setdefault(
        "dict",
        lambda: xscan.scan_dict(
            col, jnp.arange(256, dtype=jnp.int64) * 7, lo, hi, cap
        ),
    )
    fn = fns[mode]
    hard_sync(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        hard_sync(fn())
        best = min(best, time.perf_counter() - t0)
    t = max(best - oh, 1e-9)
    return n / t / 1e9  # GB/s (1 byte per row)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--csv", default=None)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    oh = overhead()
    sizes = [1 << 20, 1 << 24] if args.small else [1 << 24, 1 << 28, 1 << 30]
    sels = [1.0, 10.0, 50.0, 100.0]
    modes = ["count", "sum", "bitvector", "index", "dict"]
    rows = []
    for n in sizes:
        col = (jnp.arange(n, dtype=jnp.int32) & 255).astype(jnp.uint8)
        hard_sync(col)
        for mode in modes:
            for sel in sels:
                hi = jnp.uint8(min(255, round(sel / 100.0 * 255)))
                try:
                    gbs = bench_mode(col, mode, jnp.uint8(0), hi, oh,
                                     reps=args.reps)
                except Exception as e:
                    print(f"{mode} n={n} sel={sel}: ERROR {str(e)[:80]}")
                    continue
                rows.append((mode, n, sel, round(gbs, 2)))
                print(f"{mode:10s} n={n:>11d} sel={sel:5.1f}%  {gbs:7.2f} GB/s",
                      flush=True)
    if args.csv:
        with open(args.csv, "w") as f:
            f.write("mode,rows,selectivity,gb_per_s\n")
            for r in rows:
                f.write(",".join(map(str, r)) + "\n")
        print(f"wrote {len(rows)} rows to {args.csv}")


if __name__ == "__main__":
    main()
