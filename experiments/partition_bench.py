"""Radix-partition microbenchmark — the RadixPartitioning analog.

Reference: Scan-Micro-Benchmarks/microbenchmarks/RadixPartitioning isolates
the radix join's histogram and partition-scatter phases over radix-bit and
key-cardinality sweeps (App/Histogram.cpp:20-30).  Here the isolated phases
are the Tier-2 pipeline's stages: block sort+histogram (K-A), segment
scatter (K-B), and the XLA histogram/reorder used by the Tier-1 engines.

Usage: python experiments/partition_bench.py [--small] [--csv out.csv]
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


def timeit(fn, oh, iters=3):
    hard_sync(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        hard_sync(fn())
        best = min(best, time.perf_counter() - t0)
    return max(best - oh, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--csv", default=None)
    ap.add_argument("--sub", type=int, default=512)
    args = ap.parse_args()

    oh = overhead()
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    N = (1 << 21) if args.small else (1 << 26)
    rows = []

    def rec(name, bits, t, mrows):
        rows.append((name, N, bits, round(t * 1e3, 3), round(mrows, 1)))
        print(f"{name:28s} N={N} bits={bits:2d}  {t*1e3:8.2f} ms  "
              f"{mrows:9.1f} M rows/s", flush=True)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    keys = jax.random.randint(k1, (N,), 0, 1 << 30, jnp.int32)
    vals = jnp.arange(N, dtype=jnp.int32)
    hard_sync((keys, vals))

    # XLA histogram (radix bincount) over bit sweep
    for bits in (4, 8, 12, 16):
        fanout = 1 << bits

        @jax.jit
        def hist(k):
            b = (k >> 5) & (fanout - 1)
            return jnp.zeros((fanout,), jnp.int32).at[b].add(1, mode="drop")

        t = timeit(lambda: hist(keys), oh)
        rec("xla histogram", bits, t, N / t / 1e6)

    # XLA stable reorder by bucket (Tier-1 partition pass)
    from aqp_tpu.joins.radix import _partition_pass_jit

    for bits in (4, 8):
        t = timeit(lambda: _partition_pass_jit(keys, vals, 0, bits), oh)
        rec("xla partition pass", bits, t, N / t / 1e6)

    if on_tpu:
        from aqp_tpu.ops.pallas.compact import _plan, scatter_segments, sort_hist

        F1 = 16
        scale = jnp.float32(F1) / jnp.float32(1 << 30)
        sub = args.sub
        block = sub * 128
        n = (N // block) * block
        kk, vv = keys[:n], vals[:n]
        t = timeit(lambda: sort_hist(kk, vv, scale, sub, F1), oh)
        rec("pallas sort+hist (K-A)", 4, t, n / t / 1e6)

        ks, ps, starts = sort_hist(kk, vv, scale, sub, F1)
        nb = n // block
        rows_n = n // 128
        c1 = -(-int(rows_n / F1 / 0.85) // sub) * sub
        soff, doff, sz, ovf = _plan(nb, sub, starts, F1, c1)
        out_rows = F1 * c1 + 1
        hard_sync((ks, ps, soff))
        t = timeit(
            lambda: scatter_segments(ks, ps, soff, doff, sz, nb * F1, out_rows),
            oh,
        )
        rec("pallas seg scatter (K-B)", 4, t, n / t / 1e6)

    if args.csv:
        with open(args.csv, "w") as f:
            f.write("phase,rows,bits,ms,mrows_per_s\n")
            for r in rows:
                f.write(",".join(map(str, r)) + "\n")
        print(f"wrote {len(rows)} rows to {args.csv}")


if __name__ == "__main__":
    main()
