"""Round-5 chip session 2: smoke-test the redesigned kernels, then
re-measure every result family on the current engines (single process —
the tunneled chip's claim handoff between processes is race-prone).

Order: cheap smoke checks first (fail loudly, keep going), then the CSV
families from cheapest to most HBM-hungry.
"""
import gc
import os
import sys
import time
import traceback

sys.path.insert(0, ".")

from aqp_tpu.utils import ensure_platform_from_env

ensure_platform_from_env()

import jax
import jax.numpy as jnp

from aqp_tpu.utils.timing import hard_sync

T00 = time.monotonic()
ONLY = os.environ.get("SECTIONS")


def log(msg):
    print(f"[{time.monotonic() - T00:7.1f}s] {msg}", flush=True)


def section(name):
    def deco(fn):
        if ONLY and name not in ONLY.split(","):
            return fn
        print(f"\n===== {name} =====", flush=True)
        try:
            fn()
            print(f"===== {name} DONE =====", flush=True)
        except Exception:
            traceback.print_exc()
            print(f"===== {name} FAILED =====", flush=True)
        gc.collect()
        return fn
    return deco


def timeit(fn, reps=4):
    out = fn()
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    hard_sync(out)
    return (time.perf_counter() - t0) / reps


NR, NS = 13_107_200, 52_428_800


@section("smoke")
def smoke():
    # --- compactor v2
    from aqp_tpu.ops.pallas.lanecompact import scan_index_fast
    from aqp_tpu.ops.pallas.scan import scan_count_pallas

    n = 1 << 27
    col = (jnp.arange(n, dtype=jnp.int32) & 255).astype(jnp.uint8)
    hard_sync(col)
    for sel, hint in ((0.25, 0.3), (0.25, None)):
        ids, cnt, ovf = scan_index_fast(col, 0, 63, n // 128,
                                        sel_hint=hint)
        want = int(scan_count_pallas(col, 0, 63))
        assert int(ovf) == 0 and int(cnt) == want, (int(cnt), want,
                                                    int(ovf), hint)
        t = timeit(lambda: scan_index_fast(col, 0, 63, n // 128,
                                           sel_hint=hint), reps=3)
        log(f"index v2 sel=25% hint={hint}: {t*1e3:.1f} ms "
            f"read {n / t / 1e9:.1f} GB/s")
    del col
    gc.collect()

    # --- skew v2 geometry at z=1.5 / 1.0
    from aqp_tpu.data import create_relation_pk, create_relation_zipf
    from aqp_tpu.joins import skewtier as st
    from aqp_tpu.ops.pallas.rho3 import RETRY_SALTS

    r = create_relation_pk(NR, seed=11111)
    for z in (1.5, 1.0):
        s = create_relation_zipf(NS, NR, z, seed=22222)
        hard_sync(s.key)
        hinted, cap = st.skew_plan(s.key)
        log(f"z={z}: hinted={hinted} cap_rows={cap} "
            f"(frac={cap * 128 / NS:.3f})")

        def full(capr):
            return st.skew_fused_count(
                r.key, r.payload, s.key, s.payload, RETRY_SALTS[0],
                with_checksum=False, resid_cap_rows=capr, r_dense=True)

        m, c, ovf = full(0)
        log(f"z={z} full-cap: matches={int(m)} ovf={int(ovf)}")
        t = timeit(lambda: full(0), reps=3)
        log(f"z={z} full-cap: {t*1e3:.1f} ms -> "
            f"{(NR + NS) / t / 1e6:.0f} M rows/s")
        if cap:
            m, c, ovf = full(cap)
            log(f"z={z} resid-cap: matches={int(m)} ovf={int(ovf)}")
            t = timeit(lambda: full(cap), reps=3)
            log(f"z={z} resid-cap: {t*1e3:.1f} ms -> "
                f"{(NR + NS) / t / 1e6:.0f} M rows/s")
        del s
        gc.collect()
    del r
    gc.collect()

    # --- jittered aggregate at low cardinality
    from aqp_tpu.ops.pallas.aggpipe import groupby_aggregate_routed_auto
    from aqp_tpu.ops.aggregate import groupby_aggregate

    n = 1 << 26
    pay = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, 1 << 30,
                             jnp.int32)
    for e in (6, 10):
        k = 1 << e
        key = jax.random.randint(jax.random.PRNGKey(e), (n,), 0, k,
                                 jnp.int32)
        hard_sync(key)
        cap = max(256, 2 * k)
        g = groupby_aggregate_routed_auto(key, pay, cap)
        ng = int(g.num_groups)
        assert ng == k, (ng, k)
        t = timeit(lambda: groupby_aggregate_routed_auto(key, pay, cap),
                   reps=3)
        log(f"agg jitter 2^{e}: {t*1e3:.1f} ms {n / t / 1e6:.0f} M rows/s")
    del pay
    gc.collect()

    # --- fused TPC-H v2 on synthetic sf=1 (parity vs staged)
    from aqp_tpu.queries import (generate_tpch_tables, tpch_q12, tpch_q19)
    from aqp_tpu.queries.fused import tpch_q12_fused, tpch_q19_fused

    l, o, c, p, nt = generate_tpch_tables(scale=1.0)
    for name, fused, staged, args_f, args_s in (
            ("Q12", tpch_q12_fused, tpch_q12, (l, o), (l, o)),
            ("Q19", tpch_q19_fused, tpch_q19, (l, p), (l, p))):
        m, ok = fused(*args_f)
        rs = staged(*args_s, algorithm="RHO")
        assert bool(ok), name
        assert int(m) == int(rs.matches), (name, int(m), int(rs.matches))
        log(f"{name} v2 sf=1 parity ok ({int(m)} matches)")
    del l, o, c, p, nt


@section("skew_csv")
def skew_csv():
    from experiments.skew import main

    main()
    log("skew.csv written")


@section("overview_csv")
def overview_csv():
    from experiments.join_overview import main

    main()


@section("selectivity_csv")
def selectivity_csv():
    from experiments.selectivity import main

    main()


@section("scan_csv")
def scan_csv():
    import experiments.scan_bench as sb

    for fam, csv in (("selectivity", "scan-selectivity.csv"),
                     ("scaleup", "scan-scale-up.csv"),
                     ("residency", "scan-residency.csv")):
        rows = []
        try:
            getattr(sb, f"family_{fam}")(False, 5, rows)
        except Exception:
            traceback.print_exc()
        path = f"results/{csv}"
        with open(path, "w") as f:
            f.write("family,mode,engine,rows,selectivity,residency,"
                    "ms,read_gb_s,write_gb_s\n")
            for r in rows:
                f.write(",".join(map(str, r)) + "\n")
        log(f"wrote {path} ({len(rows)} rows)")


@section("agg_csv")
def agg_csv():
    import subprocess  # noqa: F401  (run inline instead — single process)
    import experiments.aggregate_bench as ab

    sys.argv = ["aggregate_bench", "--csv", "results/aggregate.csv"]
    ab.main()


@section("tpch10")
def tpch10():
    from experiments.tpch_bench import main

    main(scale=10.0, reps=3, source="disk")


@section("tpch30")
def tpch30():
    from experiments.tpch_bench import main

    # largest scale fitting the 16 GB chip with query intermediates;
    # staged plans skipped (the fused plans are the serving path)
    main(scale=30.0, reps=3, source="disk", csv_path="results/tpch.csv",
         append=True, run_staged=False)


@section("scaling_csv")
def scaling_csv():
    from experiments.scaling import main

    main()


@section("rho_phases")
def rho_phases():
    from experiments.rho_phases import main

    main()


log("session complete")
