"""Aggregate pipeline study — group-by throughput vs group cardinality.

North-star config 3 (BASELINE.json configs[3]): hash aggregate + sort
pipeline over join-output-shaped data.  The reference suite has no
standalone aggregate benchmark, so this family characterizes the TPU
sort-based group-by (`ops/aggregate.py::groupby_aggregate`) itself:

  rows/s vs number of distinct groups, n fixed

Chip-measured mechanics (notes/r3b_probe_aggregate.py, r3 session): the
lexicographic pair sort is ~272 ms at n=67M (246 M rows/s bound) and is
cardinality-independent; the compaction phase is capacity-sized gathers
(~35 M gathered elements/s), so cost scales with the group count — the
family shows the sort-bound plateau at low cardinality and the
gather-bound falloff once groups reach the millions.  Scatter-based dense
aggregation (the GPU-style alternative) measured 2-7x slower at every
cardinality on this chip, which is why the sort-based design is the engine.

Usage: python experiments/aggregate_bench.py [--small] [--csv out.csv]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from aqp_tpu.utils import ensure_platform_from_env, hard_sync

ensure_platform_from_env()


def timeit(fn, iters=6):
    """Async-pipelined timing, same methodology as bench.py (ADVICE r3):
    N calls issued back-to-back, one scalar fetch at the end — dispatch
    overlaps device execution instead of being subtracted from a
    separately-measured (and drifting) estimate."""
    out = fn()
    hard_sync(out)
    int(out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    int(out[0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--csv", default=None)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from aqp_tpu.ops.aggregate import groupby_aggregate
    from aqp_tpu.ops.pallas.aggpipe import \
        groupby_aggregate_routed_auto as groupby_aggregate_routed
    on_tpu = jax.devices()[0].platform not in ("cpu",)

    n = 1 << (20 if args.small else 26)
    # cardinalities from trivially-small to n/4 distinct groups
    exps = [6, 10, 14, 17, 20, 22, 24] if not args.small else [4, 8, 12]
    print(f"n={n}", flush=True)

    pay = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, 1 << 30,
                             jnp.int32)
    rows = []
    for e in exps:
        k = 1 << e
        if k > n:
            continue
        key = jax.random.randint(jax.random.PRNGKey(e), (n,), 0, k,
                                 jnp.int32)
        hard_sync((key, pay))
        cap = max(256, 2 * k)
        try:
            # engine pick mirrors bench.py: routed Pallas aggregate when it
            # fits (overflow poisons num_groups), XLA sort-based otherwise.
            # The capacity passed is the CARDINALITY bound — routed_auto
            # derives its jitter factor and boundary-row slack from it
            # (pre-padding it suppressed the jitter and sent every
            # low-cardinality config to the XLA path, round-4 artifact).
            eng = "xla"
            if on_tpu:
                try:
                    g = groupby_aggregate_routed(key, pay, cap)
                    if int(g.num_groups) <= cap:
                        eng = "routed"
                except Exception as err:
                    print(f"routed aggregate unavailable: "
                          f"{str(err)[:90]}", flush=True)
            if eng == "routed":
                fn = lambda: groupby_aggregate_routed(key, pay, cap)
            else:
                fn = lambda: groupby_aggregate(key, pay, cap)
            g = fn()
            ng = int(g.num_groups)
            assert ng <= cap, (ng, cap)
            t = timeit(fn, args.reps)
            mrows = n / t / 1e6
            print(f"groups=2^{e:<2d} ({ng:>8d} live, {eng:6s})  "
                  f"{t*1e3:8.1f} ms  {mrows:8.1f} M rows/s", flush=True)
            rows.append((n, k, ng, eng, round(t * 1e3, 2),
                         round(mrows, 1)))
        except Exception as err:  # isolate per-config failures (OOM etc.)
            print(f"groups=2^{e}: ERROR {type(err).__name__}: "
                  f"{str(err)[:100]}", flush=True)

    if args.csv:
        with open(args.csv, "w") as f:
            f.write("rows,cardinality,live_groups,engine,ms,mrows_per_s\n")
            for r in rows:
                f.write(",".join(map(str, r)) + "\n")
        print(f"wrote {len(rows)} rows to {args.csv}")


if __name__ == "__main__":
    main()
