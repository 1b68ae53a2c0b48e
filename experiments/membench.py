"""Memory/primitive microbenchmarks — the WriteBench + primitives analog.

Reference: Scan-Micro-Benchmarks/microbenchmarks/WriteBench (raw dependent
read/write/increment latency, shared/algorithms.hpp:8-41).  On TPU the
corresponding speed-of-light questions are: HBM stream bandwidth,
gather/scatter row rates, sort rates, cumsum rates — the numbers that decide
operator design (see ops/mergejoin.py and ops/pallas/compact.py docstrings).

Usage: python experiments/membench.py [--small] [--csv results/membench.csv]
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


def bench(fn, *args, oh=0.0, iters=3):
    fn = jax.jit(fn)
    hard_sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        hard_sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - oh, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--csv", default=None)
    args = ap.parse_args()

    oh = overhead()
    print(f"# device={jax.devices()[0].platform} overhead={oh*1e3:.1f} ms")
    Ns = [1 << 20] if args.small else [1 << 24, 1 << 27]
    rows = []

    def rec(name, n, t, unit, value):
        rows.append((name, n, round(t * 1e3, 3), unit, round(value, 2)))
        print(f"{name:24s} N={n:>10d}  {t*1e3:8.2f} ms  {value:10.2f} {unit}",
              flush=True)

    k = jax.random.PRNGKey(0)
    for n in Ns:
        k1, k2, k3 = jax.random.split(k, 3)
        keys = jax.random.randint(k1, (n,), 0, 1 << 30, jnp.int32)
        vals = jax.random.randint(k2, (n,), 0, 1 << 30, jnp.int32)
        perm = jax.random.permutation(k3, n).astype(jnp.int32)
        hard_sync((keys, vals, perm))

        t = bench(lambda x: x + 1, keys, oh=oh)
        rec("stream add (r+w)", n, t, "GB/s", n * 8 / t / 1e9)
        t = bench(lambda x: jnp.cumsum(x), keys, oh=oh)
        rec("cumsum", n, t, "GB/s", n * 8 / t / 1e9)
        t = bench(lambda x, i: x[i], keys, perm, oh=oh)
        rec("gather (perm)", n, t, "Mrows/s", n / t / 1e6)
        t = bench(
            lambda x, i: jnp.zeros_like(x).at[i].set(x, unique_indices=True),
            keys, perm, oh=oh,
        )
        rec("scatter (unique)", n, t, "Mrows/s", n / t / 1e6)
        t = bench(lambda x: jax.lax.sort(x), keys, oh=oh)
        rec("sort i32", n, t, "Mrows/s", n / t / 1e6)
        t = bench(lambda x, y: jax.lax.sort((x, y)), keys, vals, oh=oh)
        rec("sort pair i32", n, t, "Mrows/s", n / t / 1e6)
        if jax.devices()[0].platform not in ("cpu",):
            from aqp_tpu.ops.pallas.blocksort import sort_blocks

            t = bench(lambda x, y: sort_blocks(x, y, sub=512)[0],
                      keys, vals, oh=oh)
            rec("pallas block sort", n, t, "Mrows/s", n / t / 1e6)

    if args.csv:
        with open(args.csv, "w") as f:
            f.write("benchmark,rows,ms,unit,value\n")
            for r in rows:
                f.write(",".join(map(str, r)) + "\n")
        print(f"wrote {len(rows)} rows to {args.csv}")


if __name__ == "__main__":
    main()
