"""Routed group-by aggregate: fixed-slot range routing + segmented scans.

The XLA aggregate (ops/aggregate.py) pays one full lax.sort of the input
(~0.33 s at 80M rows) plus capacity-sized gathers.  This pipeline reuses
the fixed-slot routing network (ops/pallas/rho3.py, range-routed like
MWAY: salt=1 + domain scale, so regions are ascending key ranges) and
aggregates each region in VMEM:

  K3AGG per (f1, f2) region: merge the sorted runs, then one pass of
  SEGMENTED inclusive scans (count/sum/min/max — segments are key runs;
  key equality IS the segment flag on sorted data) in the split form
  (7 lane stages + a (W,1) row-carry scan + combine), emit one row per
  group at its run END, and compact the emitted rows with the lane
  compactor (ops/pallas/lanecompact._window_compact) inside the same
  kernel.  Regions concatenate with row-granular DMAs.

A group's rows always share a region (same key -> same range bucket), so
per-region aggregation is exact; groups come out globally sorted
ascending (range routing), matching GroupByResult's contract.

Reference anchor: the suite has no aggregate; BASELINE.json configs[3]
adds the hash-aggregate pipeline as a north-star config.  The TPU-native
answer is this routed segmented-scan design: no hash table, no scatter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aqp_tpu.ops.aggregate import GroupByResult
from aqp_tpu.ops.pallas.lanecompact import _window_compact
from aqp_tpu.ops.pallas.netsort import (
    KEY_PAD_INT,
    LANES,
    merge_runs,
    merge_runs_hybrid,
)
from aqp_tpu.ops.pallas.compact import scatter_segments
from aqp_tpu.ops.pallas.rho3 import (
    MAX_KEY,
    Rho3Params,
    pack_keys,
    route_2level,
)

HOLE = -3  # dead output slot key (never a real group key)


def _shift_rows(x, d, fill):
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row >= d, pltpu.roll(x, d, axis=0), fill)


def _seg_scans(k, v):
    """Inclusive segmented scans over a SORTED (W, 128) window (row-major
    element order): returns (cnt, sm, mn, mx) where each element holds the
    aggregate of its key run up to and including itself.  Segments = equal
    keys (sorted input).  Invalid elements (pads) are their own segments
    (k values are distinct pads) — callers mask by validity."""
    w = k.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (w, LANES), 1)
    cnt = jnp.ones_like(v)
    sm = v
    mn = v
    mx = v
    d = 1
    while d < LANES:
        ks = pltpu.roll(k, d, axis=1)
        same = (lane >= d) & (ks == k)

        def comb(x, op):
            xs = pltpu.roll(x, d, axis=1)
            return jnp.where(same, op(x, xs), x)

        cnt = comb(cnt, lambda a, b: a + b)
        sm = comb(sm, lambda a, b: a + b)
        mn = comb(mn, jnp.minimum)
        mx = comb(mx, jnp.maximum)
        d *= 2
    # row summaries: last lane's (key, aggregates)
    kl = k[:, LANES - 1:LANES]
    carries = [cnt[:, LANES - 1:LANES], sm[:, LANES - 1:LANES],
               mn[:, LANES - 1:LANES], mx[:, LANES - 1:LANES]]
    ops = [lambda a, b: a + b, lambda a, b: a + b, jnp.minimum, jnp.maximum]
    idents = [0, 0, jnp.int32(2 ** 31 - 1), jnp.int32(-(2 ** 31))]
    # exclusive segmented scan over row summaries (key = kl)
    car_k = _shift_rows(kl, 1, jnp.int32(-(2 ** 31)))
    cars = [_shift_rows(c, 1, jnp.int32(i)) for c, i in zip(carries, idents)]
    d = 1
    while d < w:
        ksh = _shift_rows(car_k, d, jnp.int32(-(2 ** 31)))
        same = ksh == car_k
        for i, op in enumerate(ops):
            csh = _shift_rows(cars[i], d, jnp.int32(idents[i]))
            cars[i] = jnp.where(same, op(cars[i], csh), cars[i])
        d *= 2
    # apply the carry to each row's leading run (elements whose key equals
    # the previous row's last key)
    take = k == car_k  # (W,128) vs (W,1) broadcast
    cnt = jnp.where(take, cnt + cars[0], cnt)
    sm = jnp.where(take, sm + cars[1], sm)
    mn = jnp.where(take, jnp.minimum(mn, cars[2]), mn)
    mx = jnp.where(take, jnp.maximum(mx, cars[3]), mx)
    return cnt, sm, mn, mx


def _make_k3agg(prm: Rho3Params, nbg: int, use_gather: bool,
                inv_salt: int):
    w = nbg * prm.kd_slot_rows

    def kernel(k_ref, v_ref, ok, ocnt, osm, omn, omx, ccount):
        k = k_ref[:].reshape(w, LANES)
        v = v_ref[:].reshape(w, LANES)
        if w % LANES == 0:
            k, v = merge_runs_hybrid(k, v, prm.kd_slot_rows,
                                     use_gather=use_gather)
        else:
            k, v = merge_runs(k, v, prm.kd_slot_rows, use_gather=use_gather)
        valid = (k >= 0) & (k != KEY_PAD_INT)
        cnt, sm, mn, mx = _seg_scans(k, jnp.where(valid, v, 0))
        # run END = last element of its key run (next element differs);
        # row-major next: lane+1 within row, first lane of next row across
        nk_lane = pltpu.roll(k, LANES - 1, axis=1)   # k[r, (l+1) mod 128]
        nk_row = pltpu.roll(nk_lane, w - 1, axis=0)  # k[r+1, 0] at l=127
        lane = jax.lax.broadcasted_iota(jnp.int32, (w, LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (w, LANES), 0)
        nxt = jnp.where(lane < LANES - 1, nk_lane,
                        jnp.where(row < w - 1, nk_row, KEY_PAD_INT))
        run_end = valid & (nxt != k)
        okey = ((k >> 1) * jnp.int32(inv_salt)) & ((1 << 30) - 1)
        outs, total = _window_compact(
            run_end, [jnp.where(run_end, okey, HOLE), cnt, sm, mn, mx],
            [HOLE, 0, 0, 0, 0])
        ok[0, 0] = outs[0]
        ocnt[0, 0] = outs[1]
        osm[0, 0] = outs[2]
        omn[0, 0] = outs[3]
        omx[0, 0] = outs[4]
        ccount[0] = jnp.full((8, LANES), total, jnp.int32)

    return kernel


def _pow2_floor(x: int) -> int:
    return 1 << max(0, x.bit_length() - 1)


@functools.partial(jax.jit, static_argnames=("capacity", "prm", "interpret"))
def groupby_aggregate_routed_auto(key, value, capacity: int,
                                  prm: Rho3Params = Rho3Params(),
                                  interpret: bool = False) -> GroupByResult:
    """Cardinality-robust routed aggregate: JITTERED range routing.

    The plain routed pipeline overflows its fixed slots when a group's
    row count exceeds the fine-slot slack (low-cardinality aggregates:
    64 groups over 67M rows = 1M copies per key — the duplicate-mass
    problem, notes/r5_probe1.log agg section).  The fix is salt-extended
    routing: route on ekey = key*J + (i mod J) so every group splits into
    J pseudo-groups that spread across regions; the per-region segmented
    scans aggregate pseudo-groups exactly, and a tiny second-level
    combine (sorted merge over <= capacity*J + boundary rows) collapses
    them.  J is chosen from `capacity` (the caller's cardinality bound)
    so pseudo-group sizes stay under the slot slack; J=1 degenerates to
    the plain pipeline.  Keys >= MAX_KEY/J would alias under the
    extension — pack_keys counts them into the overflow report, which
    poisons num_groups (callers fall back), never silently wrong."""
    jitter = max(1, min(4096, _pow2_floor(32768 // max(1, capacity))))
    if jitter == 1:
        # same boundary-row slack the jittered branch gives cap1: the
        # plain pipeline emits up to one boundary row per (region, window)
        # beyond the live groups; an unpadded capacity overflowed at
        # cardinalities just under the jitter threshold (r5 session 3)
        cap1 = capacity + 128 * prm.f1 * prm.f2 + 128
        return groupby_aggregate_routed(key, value, cap1, prm,
                                        interpret)
    n = key.shape[0]
    j = (jnp.arange(n, dtype=jnp.int32) & (jitter - 1))
    ekey = jnp.where(key < 0, key, key * jitter + j)
    cap1 = capacity * jitter + 128 * prm.f1 * prm.f2 + 128
    g = groupby_aggregate_routed(ekey, value, cap1, prm, interpret)
    big = jnp.int32(2 ** 31 - 1)
    base = jnp.where(g.key == HOLE, big, g.key // jitter)
    base, cnt, sm, mn, mx = jax.lax.sort(
        (base, g.count, g.sum.astype(jnp.int32),
         jnp.where(g.key == HOLE, big, g.min),
         jnp.where(g.key == HOLE, -big - 1, g.max)), num_keys=1)
    live = base != big
    start = jnp.concatenate(
        [live[:1], live[1:] & (base[1:] != base[:-1])])
    gid = jnp.where(live, jnp.cumsum(start.astype(jnp.int32)) - 1,
                    capacity)
    okey = jnp.full((capacity,), HOLE, jnp.int32).at[gid].set(
        base, mode="drop")
    ocnt = jnp.zeros((capacity,), jnp.int32).at[gid].add(cnt, mode="drop")
    osum = jnp.zeros((capacity,), jnp.int32).at[gid].add(sm, mode="drop")
    omin = jnp.full((capacity,), big, jnp.int32).at[gid].min(
        mn, mode="drop")
    omax = jnp.full((capacity,), -big - 1, jnp.int32).at[gid].max(
        mx, mode="drop")
    num = jnp.sum(start, dtype=jnp.int32)
    # first-level overflow (poisoned num_groups) must stay poisoned
    num = jnp.where(g.num_groups > cap1, jnp.int32(1 << 30), num)
    livemask = okey != HOLE
    return GroupByResult(
        num_groups=num,
        key=okey,
        count=jnp.where(livemask, ocnt, 0),
        sum=jnp.where(livemask, osum, 0).astype(jnp.uint32),
        min=jnp.where(livemask, omin, 0),
        max=jnp.where(livemask, omax, 0),
    )


@functools.partial(jax.jit, static_argnames=("capacity", "prm", "interpret"))
def groupby_aggregate_routed(key, value, capacity: int,
                             prm: Rho3Params = Rho3Params(),
                             interpret: bool = False) -> GroupByResult:
    """Routed group-by aggregate.  Rows with key < 0 or key >= MAX_KEY are
    DROPPED (chunked-output hole convention); group keys come out sorted
    ascending with block-granular holes at region boundaries (mask key ==
    HOLE).  Size capacity >= num_groups + 128 * f1 * f2 (one partial
    boundary row per region); undersized runs poison num_groups past
    capacity (callers assert, as bench.py does) — never silent loss."""
    use_gather = not interpret
    key = jnp.where(key < 0, jnp.int32(MAX_KEY), key)  # holes -> drop pad
    kmax = jnp.max(jnp.where(key >= MAX_KEY, 0, key))
    gmax = prm.f1 * prm.f2
    scale = (jnp.float32(gmax) / (kmax.astype(jnp.float32) + 1.0)
             * (1.0 - 1e-6))
    packed, _ = pack_keys(key, jnp.zeros_like(key), 1)
    k2, v2, nbg, ovf = route_2level(packed, value, prm, interpret, True,
                                    scale=scale)
    w = nbg * prm.kd_slot_rows
    nreg = prm.f1 * prm.f2
    col = pl.BlockSpec((1, 1, w, LANES), lambda a, b: (a, b, 0, 0))
    col_shape = jax.ShapeDtypeStruct((prm.f1, prm.f2, w, LANES), jnp.int32)
    cnt_spec = pl.BlockSpec((1, 8, LANES),
                            lambda a, b: (a * prm.f2 + b, 0, 0))
    outs = pl.pallas_call(
        _make_k3agg(prm, nbg, use_gather, 1),
        grid=(prm.f1, prm.f2),
        in_specs=[pl.BlockSpec(
            (1, nbg, 1, prm.kd_slot_rows, LANES),
            lambda a, b: (a, 0, b, 0, 0))] * 2,
        out_specs=[col] * 5 + [cnt_spec],
        out_shape=[col_shape] * 5 + [
            jax.ShapeDtypeStruct((nreg, 8, LANES), jnp.int32)],
        interpret=interpret,
    )(k2, v2)
    counts = outs[5][:, 0, 0]
    rows_per = -(-counts // LANES)
    doff = jnp.cumsum(rows_per) - rows_per
    num_groups = jnp.sum(counts, dtype=jnp.int32)
    cap_rows = -(-capacity // LANES)
    # clamp segments to the output buffer; ANY clamping is reported (the
    # per-region row padding means capacity must cover num_groups plus up
    # to nreg partial boundary rows — see docstring)
    sz = jnp.clip(jnp.minimum(rows_per, cap_rows - doff), 0, None)
    truncated = jnp.sum(rows_per - sz, dtype=jnp.int32)
    soff = jnp.arange(nreg, dtype=jnp.int32) * w
    flat = [o.reshape(nreg * w, LANES) for o in outs[:5]]
    res = []
    for i in range(0, 5, 2):
        a = flat[i]
        b = flat[i + 1] if i + 1 < 5 else jnp.zeros_like(a)
        oa, ob = scatter_segments(a, b, soff, doff, sz, nreg,
                                  cap_rows + 1, fill_key=HOLE,
                                  interpret=interpret)
        res.append(oa[:cap_rows].reshape(-1)[:capacity])
        if i + 1 < 5:
            res.append(ob[:cap_rows].reshape(-1)[:capacity])
    gkey, gcnt, gsum, gmin, gmax_ = res
    live = gkey != HOLE
    # routing slot overflow or assembly truncation poisons num_groups
    # outright: callers assert num_groups <= capacity (bench.py does), so
    # a lossy run can never be mistaken for a clean one
    num_groups = jnp.where((ovf > 0) | (truncated > 0),
                           jnp.int32(1 << 30), num_groups)
    return GroupByResult(
        num_groups=num_groups,
        key=jnp.where(live, gkey, HOLE),
        count=jnp.where(live, gcnt, 0),
        sum=jnp.where(live, gsum, 0).astype(jnp.uint32),
        min=jnp.where(live, gmin, 0),
        max=jnp.where(live, gmax_, 0),
    )
