"""Round-5 probe session 1 (single process): skew-kernel variants, lane
compactor ablation, low-card aggregate, Q19 stage profile, pipelined
overview spot checks.  Sections selectable via SECTIONS=csv env."""
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

SECTIONS = os.environ.get("SECTIONS", "skew,compact,agg,q19,overview,small"
                          ).split(",")
T00 = time.monotonic()


def log(msg):
    print(f"[{time.monotonic() - T00:7.1f}s] {msg}", flush=True)


def timeit(fn, reps=4):
    out = fn()
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    hard_sync(out)
    return (time.perf_counter() - t0) / reps


def section(name):
    def deco(fn):
        if name in SECTIONS:
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


NR, NS = 13_107_200, 52_428_800


@section("skew")
def skew():
    from aqp_tpu.data import create_relation_pk, create_relation_zipf
    from aqp_tpu.joins import skewtier as st

    r = create_relation_pk(NR, seed=11111)
    for z in (1.5, 1.0):
        s = create_relation_zipf(NS, NR, z, seed=22222)
        hard_sync((r.key, s.key))
        log(f"z={z} generated")
        t = timeit(lambda: st.heavy_candidates(s.key))
        log(f"heavy_candidates: {t*1e3:.2f} ms")
        hk = st.heavy_candidates(s.key)
        t = timeit(lambda: st.r_cand_stats(r.key, r.payload, hk,
                                           with_pay=False))
        log(f"r_cand_stats XLA keys-only: {t*1e3:.2f} ms")
        t = timeit(lambda: st.r_cand_stats(r.key, r.payload, hk,
                                           with_pay=True))
        log(f"r_cand_stats XLA +pay: {t*1e3:.2f} ms")
        try:
            t = timeit(lambda: st.r_cand_stats_pallas(
                r.key, r.payload, hk, with_pay=False, mxu=False))
            log(f"r_cand_stats_pallas sum keys-only: {t*1e3:.2f} ms")
            t = timeit(lambda: st.r_cand_stats_pallas(
                r.key, r.payload, hk, with_pay=True, mxu=False))
            log(f"r_cand_stats_pallas sum +pay: {t*1e3:.2f} ms")
        except Exception as e:
            log(f"pallas sum variant failed: {str(e)[:200]}")
        try:
            t = timeit(lambda: st.r_cand_stats_pallas(
                r.key, r.payload, hk, with_pay=False, mxu=True))
            log(f"r_cand_stats_pallas MXU keys-only: {t*1e3:.2f} ms")
            t = timeit(lambda: st.r_cand_stats_pallas(
                r.key, r.payload, hk, with_pay=True, mxu=True))
            log(f"r_cand_stats_pallas MXU +pay: {t*1e3:.2f} ms")
        except Exception as e:
            log(f"pallas MXU variant failed: {str(e)[:200]}")
        cnt, _ = st.r_cand_stats(r.key, r.payload, hk, with_pay=False)
        pres = (hk >= 0) & (cnt > 0)
        rph = jnp.zeros_like(hk).astype(jnp.uint32)
        t = timeit(lambda: st.heavy_split_pass(
            s.key, s.payload, hk, pres, rph, with_pay=False))
        log(f"heavy_split_pass keys-only: {t*1e3:.2f} ms")
        t = timeit(lambda: st.heavy_split_pass(
            s.key, s.payload, hk, pres, rph, with_pay=True))
        log(f"heavy_split_pass +pay: {t*1e3:.2f} ms")
        # full fused tiers
        hinted, cap = st.skew_plan(s.key)
        log(f"skew_plan: hinted={hinted} cap_rows={cap} "
            f"(frac={cap * 128 / NS:.3f})")
        from aqp_tpu.ops.pallas.rho3 import RETRY_SALTS

        def full(capr):
            return st.skew_fused_count(
                r.key, r.payload, s.key, s.payload, RETRY_SALTS[0],
                with_checksum=False, resid_cap_rows=capr)

        m, c, ovf = full(0)
        log(f"skew_fused full-cap: matches={int(m)} ovf={int(ovf)}")
        assert int(m) == NS and int(ovf) == 0
        t = timeit(lambda: full(0))
        log(f"skew_fused full-cap keys-only: {t*1e3:.1f} ms "
            f"-> {(NR + NS) / t / 1e6:.0f} M rows/s")
        if cap:
            m, c, ovf = full(cap)
            log(f"skew_fused resid-cap: matches={int(m)} ovf={int(ovf)}")
            assert int(m) == NS and int(ovf) == 0
            t = timeit(lambda: full(cap))
            log(f"skew_fused resid-cap keys-only: {t*1e3:.1f} ms "
                f"-> {(NR + NS) / t / 1e6:.0f} M rows/s")
        del s
        gc.collect()
    del r


@section("compact")
def compact():
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from aqp_tpu.ops.pallas import lanecompact as lc

    n = 1 << 29
    col = (jnp.arange(n, dtype=jnp.int32) & 255).astype(jnp.uint8)
    hard_sync(col)
    for sel in (25.0,):
        hi = int(round(sel / 100 * 255))
        cap_rows = n // 128
        t = timeit(lambda: lc.scan_index_fast(col, 0, hi, cap_rows), reps=3)
        log(f"scan_index_fast w=512 sel={sel}: {t*1e3:.1f} ms "
            f"read {n / t / 1e9:.1f} GB/s")
        for w in (256, 128):
            t = timeit(lambda: lc.scan_index_fast(col, 0, hi, cap_rows,
                                                  w=w), reps=3)
            log(f"scan_index_fast w={w} sel={sel}: {t*1e3:.1f} ms "
                f"read {n / t / 1e9:.1f} GB/s")

        # windows-only (no assembly/scatter): isolates the kernel
        @jax.jit
        def windows_only(c):
            blocks, counts = lc._compact_windows(
                c.astype(jnp.int32), [], jnp.int32(0), jnp.int32(hi), 512,
                False, True, (lc.PAD_S_INPUT,))
            return (jnp.sum(counts),)

        t = timeit(lambda: windows_only(col), reps=3)
        log(f"windows-only w=512: {t*1e3:.1f} ms read {n / t / 1e9:.1f} GB/s")

    # ablation kernels: where does kernel time go?
    LANES = 128

    def make_probe(w, mode):
        def kernel(lohi_ref, m_ref, out_ref, cnt_ref):
            x = m_ref[:]
            m = (x >= lohi_ref[0]) & (x <= lohi_ref[1])
            lane = jax.lax.broadcasted_iota(jnp.int32, (w, LANES), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (w, LANES), 0)
            ids = row * LANES + lane
            if mode == "copy":
                out_ref[0] = jnp.where(m, ids, 0)
                total = jnp.sum(m.astype(jnp.int32), dtype=jnp.int32)
            elif mode == "map":
                s, crow = lc._lane_compact_map(m)
                out_ref[0] = s
                total = jnp.sum(crow, dtype=jnp.int32)
            elif mode == "lanec":  # map + gather, no cross-row placement
                s, crow = lc._lane_compact_map(m)
                ck = jnp.take_along_axis(ids, s, axis=1)
                out_ref[0] = jnp.where(lane < crow, ck, 0)
                total = jnp.sum(crow, dtype=jnp.int32)
            else:  # full window compact
                outs, total = lc._window_compact(m, [ids], [0])
                out_ref[0] = outs[0]
            cnt_ref[0] = jnp.full((8, LANES), total, jnp.int32)
        return kernel

    @functools.partial(jax.jit, static_argnames=("w", "mode"))
    def probe(c, w, mode):
        nn = c.shape[0]
        nb = nn // (w * LANES)
        outs = pl.pallas_call(
            make_probe(w, mode),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nb,),
                in_specs=[pl.BlockSpec((w, LANES), lambda i, s: (i, 0))],
                out_specs=[
                    pl.BlockSpec((1, w, LANES), lambda i, s: (i, 0, 0)),
                    pl.BlockSpec((1, 8, LANES), lambda i, s: (i, 0, 0))],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((nb, w, LANES), jnp.int32),
                jax.ShapeDtypeStruct((nb, 8, LANES), jnp.int32)],
        )(jnp.stack([jnp.int32(0), jnp.int32(63)]),
          c.astype(jnp.int32).reshape(-1, LANES))
        return (outs[1][:, 0, 0].sum(),)

    for mode in ("copy", "map", "lanec", "full"):
        for w in (512, 256):
            try:
                t = timeit(lambda: probe(col, w, mode), reps=3)
                log(f"probe mode={mode} w={w}: {t*1e3:.1f} ms "
                    f"read {n / t / 1e9:.1f} GB/s")
            except Exception as e:
                log(f"probe mode={mode} w={w} FAILED: {str(e)[:160]}")
    del col


@section("agg")
def agg():
    from aqp_tpu.ops.pallas.aggpipe import groupby_aggregate_routed
    from aqp_tpu.ops.aggregate import groupby_aggregate

    n = 1 << 26
    pay = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, 1 << 30,
                             jnp.int32)
    for e in (6, 10, 14):
        k = 1 << e
        key = jax.random.randint(jax.random.PRNGKey(e), (n,), 0, k,
                                 jnp.int32)
        hard_sync((key, pay))
        cap = max(256, 2 * k) + 128 * 576
        try:
            g = groupby_aggregate_routed(key, pay, cap)
            ng = int(g.num_groups)
            log(f"routed 2^{e}: num_groups={ng} (cap={cap})")
            if ng <= cap:
                t = timeit(lambda: groupby_aggregate_routed(key, pay, cap),
                           reps=3)
                log(f"routed 2^{e}: {t*1e3:.1f} ms {n / t / 1e6:.0f} M rows/s")
                ref = groupby_aggregate(key, pay, max(256, 2 * k))
                assert ng == int(ref.num_groups), (ng, int(ref.num_groups))
        except Exception:
            traceback.print_exc()
    del pay


@section("q19")
def q19():
    from aqp_tpu.queries import generate_tpch_tables
    from aqp_tpu.queries import filters as F
    from aqp_tpu.queries import fused as QF
    from aqp_tpu.queries.fused import _cap, _compact, _mat_join, PAD_R_INPUT, \
        PAD_S_INPUT, _masked

    l, o, c, p, nt = generate_tpch_tables(scale=10.0)
    log("tables generated")
    m, ok = QF.tpch_q19_fused(l, p)
    log(f"q19 fused warm: matches={int(m)} ok={bool(ok)}")
    t = timeit(lambda: QF.tpch_q19_fused(l, p), reps=3)
    nrows = l.shipdate.shape[0] + p.key.shape[0]
    log(f"q19 fused: {t*1e3:.1f} ms -> {nrows / t / 1e6:.0f} M rows/s")

    # stage probes
    nl, np_ = l.shipdate.shape[0], p.key.shape[0]

    @jax.jit
    def stage_pcompact():
        pk, pp, okp = _compact(*F.q19_mask_part(p), _cap(np_, 1, 4),
                               PAD_R_INPUT)
        return (pk.sum(),)

    @jax.jit
    def stage_lcompact():
        lk, lp, okl = _compact(*F.q19_mask_lineitem(l), _cap(nl, 1, 8),
                               PAD_S_INPUT)
        return (lk.sum(),)

    @jax.jit
    def stage_join():
        pk, pp, okp = _compact(*F.q19_mask_part(p), _cap(np_, 1, 4),
                               PAD_R_INPUT)
        lk, lp, okl = _compact(*F.q19_mask_lineitem(l), _cap(nl, 1, 8),
                               PAD_S_INPUT)
        j, okj = _mat_join(pk, pp, lk, lp, _cap(nl, 1, 32))
        return (j.matches,)

    for name, fn in (("p-compact", stage_pcompact),
                     ("l-compact", stage_lcompact),
                     ("compacts+join", stage_join)):
        try:
            t = timeit(fn, reps=3)
            log(f"q19 {name}: {t*1e3:.1f} ms")
        except Exception:
            traceback.print_exc()
    # Q12 for comparison
    from aqp_tpu.queries.fused import tpch_q12_fused

    m, ok = tpch_q12_fused(l, o)
    t = timeit(lambda: tpch_q12_fused(l, o), reps=3)
    nrows = l.shipdate.shape[0] + o.key.shape[0]
    log(f"q12 fused: {t*1e3:.1f} ms -> {nrows / t / 1e6:.0f} M rows/s "
        f"matches={int(m)}")


@section("overview")
def overview():
    from aqp_tpu.config import JoinConfig
    from aqp_tpu.data import create_relation_pk, create_relation_fk
    from aqp_tpu.joins.api import finalize_join, run_join

    r = create_relation_pk(NR, seed=11111)
    s = create_relation_fk(NS, NR, seed=22222)
    hard_sync((r.key, s.key))
    for alg in ("RHO", "PHT", "MWAY"):
        jc = JoinConfig(defer=True, checksum=False)
        try:
            res, t = run_join(r, s, alg, jc)
            res, t = finalize_join(r, s, res, t, alg, jc)
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                res, _ = run_join(r, s, alg, jc)
            hard_sync(res.matches)
            dt = (time.perf_counter() - t0) / reps
            assert res.overflow is None or int(res.overflow) == 0
            log(f"{alg} pipelined: {dt*1e3:.1f} ms -> "
                f"{(NR + NS) / dt / 1e6:.0f} M rows/s matches={t.matches}")
        except Exception:
            traceback.print_exc()
    del r, s


@section("small")
def small():
    from aqp_tpu.config import JoinConfig
    from aqp_tpu.data import create_relation_pk, create_relation_fk
    from aqp_tpu.joins.api import finalize_join, run_join

    for nr in (131072, 1 << 20):
        r = create_relation_pk(nr, seed=11111)
        s = create_relation_fk(NS, nr, seed=22222)
        hard_sync((r.key, s.key))
        jc = JoinConfig(defer=True, checksum=False)
        res, t = run_join(r, s, "RHO", jc)
        res, t = finalize_join(r, s, res, t, "RHO", jc)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            res, _ = run_join(r, s, "RHO", jc)
        hard_sync(res.matches)
        dt = (time.perf_counter() - t0) / reps
        log(f"RHO dense |R|={nr}: {dt*1e3:.2f} ms -> "
            f"{(nr + NS) / dt / 1e6:.0f} M rows/s matches={t.matches}")
        # structural (non-dense) path for comparison
        jc2 = JoinConfig(defer=True, checksum=False, dense_path=False)
        res, t = run_join(r, s, "RHO", jc2)
        res, t = finalize_join(r, s, res, t, "RHO", jc2)
        t0 = time.perf_counter()
        for _ in range(reps):
            res, _ = run_join(r, s, "RHO", jc2)
        hard_sync(res.matches)
        dt = (time.perf_counter() - t0) / reps
        log(f"RHO pipeline |R|={nr}: {dt*1e3:.2f} ms -> "
            f"{(nr + NS) / dt / 1e6:.0f} M rows/s")
        # PHT (nphj) small-R
        res, t = run_join(r, s, "PHT", jc2)
        res, t = finalize_join(r, s, res, t, "PHT", jc2)
        t0 = time.perf_counter()
        for _ in range(reps):
            res, _ = run_join(r, s, "PHT", jc2)
        hard_sync(res.matches)
        dt = (time.perf_counter() - t0) / reps
        log(f"PHT pipeline |R|={nr}: {dt*1e3:.2f} ms -> "
            f"{(nr + NS) / dt / 1e6:.0f} M rows/s")
        del r, s
        gc.collect()


log("probe session complete")
