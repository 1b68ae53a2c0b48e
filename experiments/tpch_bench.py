"""TPC-H query benchmark (paper-8-full-query-optimization-impact.py analog).

Reference: SGXv2Scripts/scripts/paper-8-full-query-optimization-impact.py —
the per-query impact of plan optimization.  Here the two plans are:
  staged — per-phase jit boundaries (the reference's selection_1../join_1..
           timer contract, tpch.cpp:36-309), per-phase timings recorded;
  fused  — ONE jitted program per query (queries/fused.py: predicate pushed
           into the Pallas join's pad-key domain), the serving path.
Writes results/tpch.csv: one row per (query, plan, rep).
"""
import sys
import time

sys.path.insert(0, ".")

from aqp_tpu.utils import ensure_platform_from_env, hard_sync

ensure_platform_from_env()

from aqp_tpu.queries import (
    generate_tpch_tables, tpch_q3, tpch_q10, tpch_q12, tpch_q19)
from aqp_tpu.queries.fused import (
    tpch_q3_fused, tpch_q10_fused, tpch_q12_fused, tpch_q19_fused)


def load_disk_tables(scale: float):
    """dbgen-conformant binary column store (generated once on disk by
    aqp_tpu/data/tpch_dbgen.py — the reference's CSVConvert layout), loaded
    through data/tpch_loader like the reference's TpcHCommons loaders."""
    import jax

    from aqp_tpu.data import tpch_dbgen, tpch_loader

    t0 = time.perf_counter()
    base = tpch_dbgen.ensure_generated(scale)
    t1 = time.perf_counter()
    l = tpch_loader.load_lineitem(base)
    o = tpch_loader.load_orders(base)
    c = tpch_loader.load_customer(base)
    p = tpch_loader.load_part(base)
    n = tpch_loader.load_nation(base)
    jax.block_until_ready((l.key, o.key, c.key, p.key, n.key))
    print(f"disk tables sf={scale}: generate {t1 - t0:.1f}s, "
          f"load+upload {time.perf_counter() - t1:.1f}s "
          f"({l.key.shape[0]} lineitems)", flush=True)
    return l, o, c, p, n


def main(scale: float = 1.0, algorithm: str = "RHO", reps: int = 3,
         source: str = "disk", csv_path: str = "results/tpch.csv",
         append: bool = False, run_staged: bool = True):
    if source == "disk":
        l, o, c, p, n = load_disk_tables(scale)
    else:
        l, o, c, p, n = generate_tpch_tables(scale=scale)
    rows = []
    staged = [
        ("Q3", tpch_q3, (c, o, l)),
        ("Q10", tpch_q10, (c, o, l, n)),
        ("Q12", tpch_q12, (l, o)),
        ("Q19", tpch_q19, (l, p)),
    ]
    lrows = l.shipdate.shape[0]
    if not run_staged:
        staged = []
    for name, fn, args in staged:
        fn(*args, algorithm=algorithm)  # warmup: compiles out of the timing
        for rep in range(reps):
            res = fn(*args, algorithm=algorithm)
            t = res.timings
            print(
                f"{name} staged sf={scale} alg={algorithm} rep={rep}: "
                f"{t.mrows_per_s:.1f} M rows/s matches={res.matches} "
                f"phases={ {k: round(v, 4) for k, v in t.phases.items()} }",
                flush=True,
            )
            rows.append((name, scale, "staged", algorithm, rep,
                         round(t.mrows_per_s, 2), int(res.matches),
                         source))
    # reference throughput convention: (sum of the query's input-table
    # rows) / total seconds (tpch.cpp:111-114 — numTuples = l + o + c ...)
    nrows = {
        "Q3": lrows + o.num_tuples + c.num_tuples,
        "Q10": lrows + o.num_tuples + c.num_tuples + n.num_tuples,
        "Q12": lrows + o.num_tuples,
        "Q19": lrows + p.num_tuples,
    }
    fused = [
        ("Q3", tpch_q3_fused, (c, o, l)),
        ("Q10", tpch_q10_fused, (c, o, l, n)),
        ("Q12", tpch_q12_fused, (l, o)),
        ("Q19", tpch_q19_fused, (l, p)),
    ]
    for name, fn, args in fused:
        m, ok = fn(*args)
        matches = int(m)  # hard sync
        if not bool(ok):
            # a fused bound overflowed (non-TPC-H selectivity drift at
            # this scale): the staged full-capacity plan is the fallback
            # serving path — never record the truncated number
            print(f"{name} fused sf={scale}: bounds overflowed - "
                  "skipping (staged plan serves this scale)", flush=True)
            continue
        # async-pipelined reps (bench.py methodology): dispatch overlaps
        # device execution; one device->host fetch at the end
        t0 = time.perf_counter()
        for rep in range(reps):
            m, ok = fn(*args)
        assert int(m) == matches
        dt = (time.perf_counter() - t0) / reps
        mrs = nrows[name] / dt / 1e6
        print(f"{name} fused sf={scale}: {mrs:.1f} M rows/s "
              f"matches={matches} ({dt * 1e3:.1f} ms/query)", flush=True)
        for rep in range(reps):
            rows.append((name, scale, "fused", "RHO", rep,
                         round(mrs, 2), matches, source))
    import os

    os.makedirs("results", exist_ok=True)
    mode = "a" if append else "w"
    with open(csv_path, mode) as f:
        if not append:
            f.write("query,scale,plan,alg,rep,throughput_mrows,matches,"
                    "source\n")
        for r in rows:
            f.write(",".join(map(str, r)) + "\n")
    print(f"wrote {csv_path} ({len(rows)} rows)")


if __name__ == "__main__":
    scale = 0.01 if "--small" in sys.argv else 1.0
    src = "synthetic" if "--synthetic" in sys.argv else "disk"
    main(scale=scale, source=src)
