"""Round-4 chip session: all remaining studies in ONE process.

The tunneled chip's claim handoff between processes is race-prone (a new
process that binds too soon after another exits can wedge until the stale
grant expires), so the remaining TPU studies run sequentially inside one
process: skew sweep, TPC-H sf=10, join-selectivity sweep, scan families,
roofline accounting.
"""
import sys
import traceback

sys.path.insert(0, ".")

from aqp_tpu.utils import ensure_platform_from_env

ensure_platform_from_env()


def _run(name, fn):
    print(f"\n===== {name} =====", flush=True)
    try:
        fn()
        print(f"===== {name} DONE =====", flush=True)
    except Exception:
        traceback.print_exc()
        print(f"===== {name} FAILED =====", flush=True)


def skew():
    from experiments.skew import main

    main()


def tpch10():
    from experiments.tpch_bench import main

    main(scale=10.0, reps=3)


def selectivity():
    from experiments.selectivity import main

    main()


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


def roofline():
    from experiments.roofline import main

    main()


def aggregates():
    import subprocess  # noqa: F401  (same-process: call main directly)
    sys.argv = ["aggregate_bench", "--csv", "results/aggregate.csv"]
    from experiments.aggregate_bench import main

    main()


if __name__ == "__main__":
    only = set(sys.argv[1:])
    studies = [("skew", skew), ("tpch_sf10", tpch10),
               ("selectivity", selectivity), ("scans", scans),
               ("roofline", roofline), ("aggregate", aggregates)]
    for name, fn in studies:
        if only and name not in only:
            continue
        _run(name, fn)
