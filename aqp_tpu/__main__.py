"""Command-line layer — the analog of the reference's four binaries
(`native`, `teebench`, `tpch`, `tpch-native`; App/CMakeLists.txt:47-79) with
the getopt surface of lib/AppUtilities/src/commons.cpp:10-190 mapped onto
subcommands:

    python -m aqp_tpu join  -a RHO -r 13107200 -s 52428800 [-z skew]
                            [-l selectivity] [-m] [--reps N] [--csv out.csv]
    python -m aqp_tpu tpch  -q 3 --scale 1.0 -a RHO [--data DIR]
    python -m aqp_tpu scan  --mode bitvector --rows 268435456 --selectivity 10
    python -m aqp_tpu matrix --algs RHO,PHT --sizes 1048576x4194304 ...

There is no enclave/native mode split: the "trust boundary" of the TPU build
is host↔HBM, crossed once at data load (`jax.device_put` ≈
ecall_preload_relations, secure_joins.cpp:34-49).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _profile_ctx(args):
    """(context manager, logdir|None) for --profile: captures a
    jax.profiler trace around the measured section (PerfEvent analog,
    utils/profiler.py)."""
    logdir = getattr(args, "profile", None)
    if logdir:
        from aqp_tpu.utils import profiler

        return profiler.trace(logdir), logdir
    import contextlib

    return contextlib.nullcontext(), None


def _profile_extras(logdir):
    if not logdir:
        return {}
    from aqp_tpu.utils import profiler

    rep = profiler.parse_trace(logdir)
    print(f"# profile: device {rep.device_total_s*1e3:.2f} ms over "
          f"{sum(rep.per_program_calls.values())} program executions "
          f"-> {logdir}", file=sys.stderr)
    return {"device_total_s": round(rep.device_total_s, 6),
            "profile_dir": logdir}


def _dataset_sizes(name: str):
    # commons.cpp:85-97 predefined datasets (rows of 8-byte tuples)
    if name == "cache-fit":
        return 10 * (1 << 20) // 8, 40 * (1 << 20) // 8
    if name == "cache-exceed":
        return 100 * (1 << 20) // 8, 400 * (1 << 20) // 8
    if name == "L":
        return 50_000_000, 200_000_000
    raise SystemExit(f"unknown dataset {name} (cache-fit|cache-exceed|L)")


def cmd_join(args):
    import jax

    from aqp_tpu.config import JoinConfig
    from aqp_tpu.data import (
        create_relation_fk,
        create_relation_fk_sel,
        create_relation_pk,
        create_relation_zipf,
    )
    from aqp_tpu.joins.api import run_join

    nr, ns = (args.r, args.s) if args.x is None else _dataset_sizes(args.x)
    dtype = jax.numpy.int32
    if args.key64:
        # KEY_8B analog (data-types.h:6-12): 64-bit keys end-to-end
        jax.config.update("jax_enable_x64", True)
        dtype = jax.numpy.int64
    relR = create_relation_pk(nr, seed=args.seed_r, dtype=dtype)
    if args.z:
        relS = create_relation_zipf(ns, nr, args.z, seed=args.seed_s,
                                    dtype=dtype)
    elif args.l is not None:
        relS = create_relation_fk_sel(ns, nr, args.l, seed=args.seed_s,
                                      dtype=dtype)
    else:
        relS = create_relation_fk(ns, nr, seed=args.seed_s, dtype=dtype)
    jax.block_until_ready((relR.key, relS.key))
    cfg = JoinConfig(
        materialize=args.m,
        radix_bits=args.radix_bits,
        passes=args.passes,
        use_pallas=not args.no_pallas,
        key64=args.key64,
    )
    best = None
    ctx, logdir = _profile_ctx(args)
    with ctx:
        for rep in range(args.reps):
            result, t = run_join(relR, relS, args.a, cfg)
            if best is None or t.total < best.total:
                best = t
            if not args.quiet:
                print(f"# rep {rep}: {t.mrows_per_s:.1f} M rows/s",
                      file=sys.stderr)
    best.print_contract()
    print(best.json_line(alg=args.a, size_r=nr, size_s=ns,
                         **_profile_extras(logdir)))


def cmd_tpch(args):
    from aqp_tpu.queries import (
        generate_tpch_tables,
        tpch_q3,
        tpch_q10,
        tpch_q12,
        tpch_q19,
    )

    if args.data:
        from aqp_tpu.data import tpch_loader as L

        l = L.load_lineitem(args.data)
        o = L.load_orders(args.data)
        c = L.load_customer(args.data)
        p = L.load_part(args.data)
        n = L.load_nation(args.data)
    else:
        l, o, c, p, n = generate_tpch_tables(scale=args.scale)
    if args.fused:
        import time

        from aqp_tpu.queries import fused as FU
        from aqp_tpu.utils.timing import Timings

        fused_plans = {
            3: (lambda: FU.tpch_q3_fused(c, o, l),
                c.num_tuples + o.num_tuples + l.num_tuples),
            10: (lambda: FU.tpch_q10_fused(c, o, l, n),
                 c.num_tuples + o.num_tuples + l.num_tuples + n.num_tuples),
            12: (lambda: FU.tpch_q12_fused(l, o),
                 l.num_tuples + o.num_tuples),
            19: (lambda: FU.tpch_q19_fused(l, p),
                 l.num_tuples + p.num_tuples),
        }
        fn, rows_in = fused_plans[args.q]
        m, ok = fn()  # compile + correctness
        assert bool(ok), "fused capacity bound exceeded; rerun without --fused"
        best = 1e30
        ctx, logdir = _profile_ctx(args)
        with ctx:
            for _ in range(args.reps):
                t0 = time.perf_counter()
                m, ok = fn()
                int(m)
                best = min(best, time.perf_counter() - t0)
        t = Timings(phases={"total": best}, rows_in=rows_in, matches=int(m))
        t.print_contract()
        print(t.json_line(query=f"Q{args.q}", alg="fused", scale=args.scale,
                          **_profile_extras(logdir)))
        return
    plans = {
        3: lambda: tpch_q3(c, o, l, algorithm=args.a),
        10: lambda: tpch_q10(c, o, l, n, algorithm=args.a),
        12: lambda: tpch_q12(l, o, algorithm=args.a),
        19: lambda: tpch_q19(l, p, algorithm=args.a),
    }
    if args.q not in plans:
        raise SystemExit(f"query must be one of {sorted(plans)}")
    best = None
    ctx, logdir = _profile_ctx(args)
    with ctx:
        for _ in range(args.reps):
            res = plans[args.q]()
            if best is None or res.timings.total < best.timings.total:
                best = res
    best.timings.print_contract()
    print(best.timings.json_line(query=f"Q{args.q}", alg=args.a,
                                 scale=args.scale,
                                 **_profile_extras(logdir)))


def cmd_scan(args):
    import jax
    import jax.numpy as jnp

    from aqp_tpu.ops import scan as S

    n = args.rows
    col = (jnp.arange(n, dtype=jnp.int32) & 255).astype(jnp.uint8)
    hi = jnp.uint8(min(255, round(args.selectivity / 100.0 * 255)))
    lo = jnp.uint8(0)
    jax.block_until_ready(col)
    mode = args.mode
    cap = max(8, int(n * min(1.0, args.selectivity / 100.0 * 1.2)))
    fns = {
        "count": lambda: S.scan_count(col, lo, hi),
        "sum": lambda: S.scan_sum(col, lo, hi),
        "bitvector": lambda: S.scan_bitvector(col, lo, hi),
        "index": lambda: S.scan_index(col, lo, hi, cap),
        "values": lambda: S.scan_values(col, lo, hi, cap),
        "dict": lambda: S.scan_dict(
            col, jnp.arange(256, dtype=jnp.int64) * 7, lo, hi, cap
        ),
    }
    if mode not in fns:
        raise SystemExit(f"mode must be one of {sorted(fns)}")
    out = fns[mode]()
    jax.block_until_ready(out)
    best = float("inf")
    ctx, logdir = _profile_ctx(args)
    with ctx:
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fns[mode]())
            best = min(best, time.perf_counter() - t0)
    gbs = n / best / 1e9
    print(json.dumps({"mode": mode, "rows": n, "selectivity": args.selectivity,
                      "seconds": round(best, 6), "gb_per_s": round(gbs, 2),
                      **_profile_extras(logdir)}))


def cmd_matrix(args):
    from aqp_tpu.harness.runner import ExperimentConfig, run_experiments, rows_to_csv

    sizes = []
    for spec in args.sizes.split(","):
        r, s = spec.lower().split("x")
        sizes.append((int(r), int(s)))
    cfg = ExperimentConfig(
        algorithms=tuple(args.algs.split(",")),
        sizes=tuple(sizes),
        skews=tuple(float(z) for z in args.skews.split(",")) if args.skews else (None,),
        materialize=(True, False) if args.materialize == "both" else (args.materialize == "1",),
        reps=args.reps,
        profile_dir=args.profile,
    )
    rows = run_experiments(cfg)
    if args.csv:
        rows_to_csv(rows, args.csv, append=args.append)
        print(f"# wrote {len(rows)} rows to {args.csv}", file=sys.stderr)


def main(argv=None):
    import os

    # Pallas bitonic blocks at sub>=1024 need the scoped-VMEM raise; must be
    # set before the first TPU compile (bench.py sets the same default).
    os.environ.setdefault(
        "LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=100000")
    # Honor JAX_PLATFORMS=cpu even where sitecustomize pre-registers the TPU
    # plugin and captures the env before this process's vars take effect.
    from aqp_tpu.utils import ensure_platform_from_env

    ensure_platform_from_env()

    p = argparse.ArgumentParser(prog="aqp_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    j = sub.add_parser("join", help="single join run (native.cpp analog)")
    j.add_argument("-a", default="RHO", help="algorithm name (joins.cpp table)")
    j.add_argument("-r", type=int, default=1 << 21, help="|R| rows")
    j.add_argument("-s", type=int, default=1 << 21, help="|S| rows")
    j.add_argument("-x", default=None, help="predefined dataset: cache-fit|cache-exceed|L")
    j.add_argument("-z", type=float, default=0.0, help="Zipf skew exponent")
    j.add_argument("-l", type=float, default=None, help="selectivity percent")
    j.add_argument("-m", action="store_true", help="materialize output")
    j.add_argument("--radix-bits", type=int, default=None)
    j.add_argument("--passes", type=int, default=None)
    j.add_argument("--no-pallas", action="store_true")
    j.add_argument("--key64", action="store_true",
                   help="64-bit keys (KEY_8B analog)")
    j.add_argument("--reps", type=int, default=3)
    j.add_argument("--seed-r", type=int, default=11111)
    j.add_argument("--seed-s", type=int, default=22222)
    j.add_argument("--quiet", action="store_true")
    j.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace (PerfEvent analog)")
    j.set_defaults(fn=cmd_join)

    t = sub.add_parser("tpch", help="TPC-H query run (TpcHApp.cpp analog)")
    t.add_argument("-q", type=int, required=True, help="query: 3|10|12|19")
    t.add_argument("-a", default="RHO")
    t.add_argument("--scale", type=float, default=0.1)
    t.add_argument("--data", default=None, help="binary column dir (scale###)")
    t.add_argument("--reps", type=int, default=3)
    t.add_argument("--fused", action="store_true",
                   help="single-program fused plan (serving path)")
    t.add_argument("--profile", default=None, metavar="DIR")
    t.set_defaults(fn=cmd_tpch)

    s = sub.add_parser("scan", help="column-scan microbenchmark (SimdScanMulti analog)")
    s.add_argument("--mode", default="bitvector")
    s.add_argument("--rows", type=int, default=1 << 26)
    s.add_argument("--selectivity", type=float, default=10.0)
    s.add_argument("--reps", type=int, default=5)
    s.add_argument("--profile", default=None, metavar="DIR")
    s.set_defaults(fn=cmd_scan)

    m = sub.add_parser("matrix", help="experiment matrix → CSV (runner.py analog)")
    m.add_argument("--algs", default="RHO")
    m.add_argument("--sizes", default="1048576x4194304")
    m.add_argument("--skews", default=None)
    m.add_argument("--materialize", default="0", choices=("0", "1", "both"))
    m.add_argument("--reps", type=int, default=3)
    m.add_argument("--csv", default=None)
    m.add_argument("--append", action="store_true")
    m.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a device trace per rep; adds device_total_s rows")
    m.set_defaults(fn=cmd_matrix)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
