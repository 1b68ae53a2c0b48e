"""Scan configuration-spectrum driver — the SimdScanMulti analog.

Reference: Scan-Micro-Benchmarks/microbenchmarks/SimdScanMulti enumerates a
config spectrum (App/types.hpp:106-189): mode x entries x selectivity x
preload x cached/unique x threads, one PerfEventBlock CSV row each
(App/App.cpp), feeding the paper's write-rate.csv / scale-up.csv families.

TPU analogs of the reference axes:
  mode        -> the same six scan modes (count/sum/bitvector/index/values/
                 dict), each in two engines: `xla` (fused HLO, the scalar/
                 auto-vec analog) and `pallas` (hand-tiled kernels, the
                 SIMD512 analog).
  entries     -> size sweep spanning VMEM-class to HBM-resident columns.
  selectivity -> predicate range width, as in the reference.
  preload     -> residency: `resident` re-scans a device-resident column
                 (preload=true); `streamed` pays the host->device transfer
                 per scan (preload=false / enclave-copy analog).
  threads     -> n/a on one chip (mesh scaling lives in parallel/).

Families written (reference CSV-family analogs):
  selectivity -> results/scan-selectivity.csv   (write-rate.csv analog)
  scaleup     -> results/scan-scale-up.csv      (scale-up.csv analog)
  residency   -> results/scan-residency.csv     (preload spectrum analog)

Write modes use a full-size preallocated output (cap_rows = n/128), matching
the reference's worst-case buffers, so one compile covers the whole
selectivity sweep (lo/hi are traced scalars).

Usage: python experiments/scan_bench.py [--small] [--family all] [--csv-dir results]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from aqp_tpu.utils import ensure_platform_from_env

ensure_platform_from_env()

import jax
import jax.numpy as jnp

LANES = 128


def log(msg):
    print(f"[scan] {msg}", file=sys.stderr, flush=True)


def time_async(fn, reps, fetch):
    """Mean s/call over an async-pipelined loop; `fetch(out)` forces a real
    device->host scalar round trip at the end (block_until_ready alone has
    been observed not to block on this platform)."""
    out = fn()
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / reps


def make_fns(col, n, engine, cap_rows, dict_lo, dict_hi):
    """mode -> (fn(lo, hi) -> out, fetch(out), write_bytes_per_row)."""
    if engine == "pallas":
        from aqp_tpu.ops.pallas import scan as ps

        return {
            "count": (lambda lo, hi: ps.scan_count_pallas(col, lo, hi),
                      lambda o: int(o), 0),
            "sum": (lambda lo, hi: ps.scan_sum_pallas(col, lo, hi),
                    lambda o: int(o), 0),
            "bitvector": (lambda lo, hi: ps.scan_bitvector_pallas(col, lo, hi),
                          lambda o: int(o[0]), 0.125),
            "index": (lambda lo, hi, sel=None: ps.scan_index_pallas(
                col, lo, hi, cap_rows, sel_hint=sel),
                lambda o: int(o[1]), 4),
            "values": (lambda lo, hi, sel=None: ps.scan_values_pallas(
                col, lo, hi, cap_rows, sel_hint=sel),
                lambda o: int(o[2]), 8),
            "dict": (lambda lo, hi, sel=None: ps.scan_dict_pallas(
                col, dict_lo, dict_hi, lo, hi, cap_rows, sel_hint=sel),
                lambda o: int(o[3]), 12),
        }
    from aqp_tpu.ops import scan as xs

    cap = cap_rows * LANES

    @jax.jit
    def xla_dict(lo, hi):
        # 64-bit dict values as two int32 planes (int64 needs the global
        # x64 flag — astype would silently truncate); same write volume as
        # the reference's 64-bit gather, plane-split like the Pallas path
        ids, cnt = xs.scan_index(col, lo, hi, cap)
        codes = col[ids].astype(jnp.int32)
        return jnp.take(dict_lo, codes), jnp.take(dict_hi, codes), cnt

    return {
        "count": (lambda lo, hi: xs.scan_count(col, lo, hi),
                  lambda o: int(o), 0),
        "sum": (lambda lo, hi: xs.scan_sum(col, lo, hi),
                lambda o: int(o), 0),
        "bitvector": (lambda lo, hi: xs.scan_bitvector(col, lo, hi),
                      lambda o: int(o[0]), 0.125),
        "index": (lambda lo, hi: xs.scan_index(col, lo, hi, cap),
                  lambda o: int(o[1]), 4),
        "values": (lambda lo, hi: xs.scan_values(col, lo, hi, cap),
                   lambda o: int(o[1]), 4),
        "dict": (xla_dict, lambda o: int(o[2]), 8),
    }


def sel_bounds(sel):
    """Predicate [0, hi] over a uniform 0..255 column ~= sel% qualifying."""
    hi = max(0, min(255, round(sel / 100.0 * 256) - 1))
    return jnp.uint8(0), jnp.uint8(hi)


def make_col(n):
    col = (jnp.arange(n, dtype=jnp.int32) & 255).astype(jnp.uint8)
    jax.block_until_ready(col)
    return col


def dict_planes():
    d = jnp.arange(256, dtype=jnp.int32) * 7
    return d, d + 1


MODES = ("count", "sum", "bitvector", "index", "values", "dict")


def run_config(fns, mode, sel, n, reps):
    fn, fetch, wb = fns[mode]
    lo, hi = sel_bounds(sel)
    import inspect

    takes_sel = "sel" in inspect.signature(fn).parameters
    if takes_sel:
        t = time_async(lambda: fn(lo, hi, sel / 100.0), reps, fetch)
    else:
        t = time_async(lambda: fn(lo, hi), reps, fetch)
    read_gbs = n / t / 1e9  # 1 byte/row
    write_gbs = (n * (sel / 100.0) * wb) / t / 1e9 if wb else 0.0
    return t, read_gbs, write_gbs


def run_config_safe(fns, mode, sel, n, reps):
    """One config must not kill the family (e.g. OOM of a 2^29 write-mode
    output buffer); errors are logged and skipped."""
    try:
        return run_config(fns, mode, sel, n, reps)
    except Exception as e:
        log(f"ERROR {mode} n={n} sel={sel}: {str(e)[:90]}")
        return None


def family_selectivity(small, reps, rows):
    # Column sizes sized ABOVE the ~5 ms dispatch floor of this platform
    # (a 2^26 column reads in <0.1 ms at HBM speed, so per-call timing
    # measured the tunnel, not the kernel — round-3 CSVs capped near
    # 13 GB/s for that reason).  Write modes use smaller columns than the
    # read-only modes to keep output buffers inside HBM.
    n_mode = (
        {m: 1 << 20 for m in MODES} if small else {
            "count": 1 << 30, "sum": 1 << 30, "bitvector": 1 << 30,
            "index": 1 << 29, "values": 1 << 28, "dict": 1 << 28,
        })
    dlo, dhi = dict_planes()
    sels = [1.0, 10.0, 25.0, 50.0, 75.0, 100.0]
    for engine in ("pallas", "xla"):
        if engine == "pallas" and jax.devices()[0].platform == "cpu":
            continue  # Pallas TPU kernels don't run on the CPU backend
        for mode in MODES:
            # the XLA engine's write modes are orders slower (no compress
            # primitive): keep their columns at 2^26 so the family finishes
            n = n_mode[mode]
            if engine == "xla" and not small:
                n = min(n, 1 << 26)
            col = make_col(n)
            fns = make_fns(col, n, engine, n // LANES, dlo, dhi)
            for sel in sels:
                fns_m = fns
                if engine == "pallas" and mode in ("index", "values",
                                                   "dict"):
                    # selectivity-scaled output (the serving contract:
                    # callers size the index buffer by expected matches;
                    # a full-size buffer costs a 4n-byte pad fill that
                    # the reference's preallocated-but-unfilled output
                    # never pays).  The overflow channel validates the
                    # bound — on ovf fall back to the full-size buffer.
                    capf = min(1.0, sel / 100.0 * 1.6 + 0.002)
                    capr = max(256, int(n * capf) // LANES)
                    fns_m = make_fns(col, n, engine, capr, dlo, dhi)
                    lo_, hi_ = sel_bounds(sel)
                    if int(fns_m[mode][0](lo_, hi_, sel / 100.0)[-1]) != 0:
                        log(f"sel {mode} sel={sel}: scaled cap overflowed"
                            " - using full-size buffer")
                        fns_m = fns
                got = run_config_safe(fns_m, mode, sel, n, reps)
                if got is None:
                    continue
                t, r, w = got
                rows.append(("selectivity", mode, engine, n, sel,
                             "resident", round(t * 1e3, 3), round(r, 2),
                             round(w, 2)))
                log(f"sel {engine}:{mode} n={n} sel={sel:5.1f}% "
                    f"read {r:7.2f} GB/s write {w:6.2f} GB/s")
            del col, fns


def family_scaleup(small, reps, rows):
    sizes = [1 << 17, 1 << 20] if small else [
        1 << 17, 1 << 20, 1 << 23, 1 << 26, 1 << 29, 1 << 30]
    dlo, dhi = dict_planes()
    for n in sizes:
        col = make_col(n)
        cap_rows = n // LANES
        for engine in ("pallas", "xla"):
            if engine == "pallas" and jax.devices()[0].platform == "cpu":
                continue
            fns = make_fns(col, n, engine, cap_rows, dlo, dhi)
            modes = ("count", "values") if n < (1 << 29) else ("count",)
            for mode in modes:  # one compute-, one write-bound
                got = run_config_safe(fns, mode, 10.0, n, reps)
                if got is None:
                    continue
                t, r, w = got
                rows.append(("scaleup", mode, engine, n, 10.0, "resident",
                             round(t * 1e3, 3), round(r, 2), round(w, 2)))
                log(f"scaleup {engine}:{mode} n={n:>10d} read {r:7.2f} GB/s")
        del col


def family_residency(small, reps, rows):
    """preload=true/false analog: device-resident re-scan vs paying the
    host->device copy per scan (the enclave-ingress cost of the reference's
    preload=false runs)."""
    n = 1 << (20 if small else 28)
    host = np.asarray(make_col(n))
    dlo, dhi = dict_planes()
    cap_rows = n // LANES
    engine = "pallas" if jax.devices()[0].platform != "cpu" else "xla"
    col_dev = jnp.asarray(host)
    jax.block_until_ready(col_dev)
    fns = make_fns(col_dev, n, engine, cap_rows, dlo, dhi)
    for mode in ("count", "index"):
        got = run_config_safe(fns, mode, 10.0, n, reps)
        if got is None:
            continue
        t, r, w = got
        rows.append(("residency", mode, engine, n, 10.0, "resident",
                     round(t * 1e3, 3), round(r, 2), round(w, 2)))
        fn, fetch, wb = fns[mode]
        lo, hi = sel_bounds(10.0)

        def streamed_mono():
            """one monolithic device_put per scan (preload=false, naive)"""
            c = jax.device_put(host)
            f2 = make_fns(c, n, engine, cap_rows, dlo, dhi)[mode][0]
            return f2(lo, hi)

        variants = [("streamed", streamed_mono)]
        if mode == "count":
            from aqp_tpu.ops.scan import scan_count_streamed

            def streamed_pipe():
                """chunked double-buffered stream (transfer i+1 rides
                under scan i via async dispatch)"""
                return scan_count_streamed(host, lo, hi, chunk=1 << 25)

            variants.append(("streamed_pipelined", streamed_pipe))
        for vname, vfn in variants:
            try:
                t = time_async(vfn, max(1, reps // 2),
                               fetch if vname == "streamed" else int)
            except Exception as e:
                log(f"ERROR residency {vname} {mode}: {str(e)[:90]}")
                continue
            r = n / t / 1e9
            w = (n * 0.1 * wb) / t / 1e9 if wb else 0.0
            rows.append(("residency", mode, engine, n, 10.0, vname,
                         round(t * 1e3, 3), round(r, 2), round(w, 2)))
            log(f"residency {mode} {vname}: {r:.2f} GB/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--family", default="all",
                    choices=["all", "selectivity", "scaleup", "residency"])
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--csv-dir", default="results")
    args = ap.parse_args()

    rows = []
    fams = {
        "selectivity": (family_selectivity, "scan-selectivity.csv"),
        "scaleup": (family_scaleup, "scan-scale-up.csv"),
        "residency": (family_residency, "scan-residency.csv"),
    }
    todo = list(fams) if args.family == "all" else [args.family]
    for name in todo:
        fn, csv = fams[name]
        rows.clear()
        fn(args.small, args.reps, rows)
        path = f"{args.csv_dir}/{csv}"
        with open(path, "w") as f:
            f.write("family,mode,engine,rows,selectivity,residency,"
                    "ms,read_gb_s,write_gb_s\n")
            for r in rows:
                f.write(",".join(map(str, r)) + "\n")
        print(f"wrote {path} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
