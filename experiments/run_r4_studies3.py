"""Round-4 chip session 3: lane-compactor-dependent studies + validation.

Requires the scalar-total Mosaic fixes (session-2 snapshot predated them):
kernel smoke, scan write modes, TPC-H sf=10 (fused plans ride
compact_kp_fast), routed aggregate, cracking re-measure, bench warm-up
(fills the committed .jax_cache for the driver's bench run).
"""
import subprocess
import sys
import time
import traceback

sys.path.insert(0, ".")

from aqp_tpu.utils import ensure_platform_from_env

ensure_platform_from_env()


def _run(name, fn):
    print(f"\n===== {name} =====", flush=True)
    t0 = time.time()
    try:
        fn()
        print(f"===== {name} DONE ({time.time()-t0:.0f}s) =====", flush=True)
    except Exception:
        traceback.print_exc()
        print(f"===== {name} FAILED =====", flush=True)


def smoke():
    from experiments.run_r4_studies2 import smoke as s

    s()


def scans():
    import experiments.scan_bench as sb

    for fam, csv in (("selectivity", "scan-selectivity.csv"),
                     ("scaleup", "scan-scale-up.csv"),
                     ("residency", "scan-residency.csv")):
        rows = []
        getattr(sb, f"family_{fam}")(False, 5, rows)
        path = f"results/{csv}"
        with open(path, "w") as f:
            f.write("family,mode,engine,rows,selectivity,residency,"
                    "ms,read_gb_s,write_gb_s\n")
            for r in rows:
                f.write(",".join(map(str, r)) + "\n")
        print(f"wrote {path} ({len(rows)} rows)", flush=True)


def tpch10():
    from experiments.tpch_bench import main

    main(scale=10.0, reps=3)


def aggregates():
    old = sys.argv
    sys.argv = ["aggregate_bench", "--csv", "results/aggregate.csv"]
    try:
        from experiments.aggregate_bench import main

        main()
    finally:
        sys.argv = old


def cracking():
    old = sys.argv
    sys.argv = ["cracking"]
    try:
        from experiments.cracking import main

        main()
    finally:
        sys.argv = old


def bench_warm():
    """Run bench.py's metric functions in-process with the COMMITTED cache
    dir so the driver's end-of-round bench run hits a warm cache for the
    new aggregate path (the headline kernels are unchanged since r3)."""
    import os

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    os.environ["BENCH_BUDGET_S"] = "100000"
    import bench

    bench.T0 = time.monotonic()
    bench.BUDGET = 100000
    bench.main()


def skew():
    from experiments.skew import main

    main()


if __name__ == "__main__":
    only = set(sys.argv[1:])
    studies = [("smoke", smoke), ("skew", skew), ("tpch_sf10", tpch10),
               ("aggregate", aggregates), ("bench_warm", bench_warm),
               ("scans", scans), ("cracking", cracking)]
    for name, fn in studies:
        if only and name not in only:
            continue
        _run(name, fn)
