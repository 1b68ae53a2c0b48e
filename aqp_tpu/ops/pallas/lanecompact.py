"""Fast mask compaction: lane-recursive-doubling + MXU row scatter.

The write-producing scan modes (SIMD512 index/values/dict — SIMD512.cpp
compressstoreu kernels) and the aggregate/materialize paths all reduce to
one primitive: compact the elements where mask holds, preserving order.
Round 3 served this with a full in-VMEM bitonic SORT per block
(ops/pallas/compact.compact_kp — ~153 compare-exchange stages); but a
0/1-partition does not need a sort.  This kernel compacts a (W, 128)
window in ~12 vector passes + two small MXU matmuls:

  1. LANE compaction per row (stable): recursive doubling over lane groups
     g = 1..64 — at each stage adjacent compacted groups concatenate via
     one `take_along_axis` (the VPU's dynamic lane gather).  Only the
     SOURCE-INDEX map is pushed through the stages; payload arrays are
     gathered once at the end.
  2. CROSS-ROW placement: row r's compacted run starts at the global
     offset C_r (exclusive prefix of row counts, a (W,1) log-shift scan).
     Each row lands in at most TWO output rows, so placement = one
     per-row lane ROTATION (take_along_axis with per-row shift) + two
     ONE-HOT int8 matmuls on the MXU (P1[d,r] = d==C_r>>7 and the +1 row;
     masked parts are lane-disjoint, so the matmul's sum IS the merge —
     the same 8-bit-plane exactness trick as rho3._extract_slots_mxu).
  3. Windows concatenate with row-granular dynamic-size DMAs
     (compact.scatter_segments) — boundary rows may carry pad elements
     (the established block-granular contract of compact_kp).

Round-5 redesign (chip ablation notes/r5_probe1.log: the kernel is
VPU/IO-bound, not matmul-bound):
  * SELECTIVITY-SCALED OUTPUT (`out_w` rows per window): placement
    matmuls, output VMEM traffic, and the assembly DMAs all shrink by the
    expected selectivity; a window whose count exceeds out_w*128 is cut
    and REPORTED through the overflow channel (callers escalate to
    out_w = w), never silently dropped.
  * uint8-NATIVE column input for the scan modes (the 4x widened column
    never touches HBM).
  * PLANE-COUNT-AWARE moves: 8-bit code columns ride ONE int8 plane,
    row-ids ride TWO (window-local ids < 2^16, base added outside);
    arbitrary int32 (keys) keep four.
  * Row-ids come from the compaction map itself (no gather).

Replaces the reference's AVX-512 `vcompressstoreu` (SIMD512.cpp) with a
TPU-native design: the VPU has no compress instruction, but it has cheap
lane gathers and a free systolic array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aqp_tpu.ops.pallas.compact import (
    PAD_R_INPUT,
    PAD_S_INPUT,
    scatter_segments,
)

LANES = 128


def _lane_compact_map(m):
    """Per-row stable compaction map from a bool mask (W, 128).

    Returns (s, crow): s[r, o] = source lane of the o-th valid lane in row
    r (garbage for o >= crow[r]); crow (W, 1) = per-row valid count.
    log2(128) = 7 stages of recursive doubling; each stage concatenates
    adjacent compacted lane groups with ONE gather.  The group counts
    need no gathers at all: a group's count is CONSTANT across its lanes,
    so the neighbor group's count is one STATIC lane rotation away
    (pltpu.roll) — the dynamic gathers were ~2/3 of the map's VPU cost
    (chip ablation notes/r5_probe1.log)."""
    w = m.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (w, LANES), 1)
    s = lane
    # c[r, l] = valid count of the g-sized group CONTAINING lane l
    c = m.astype(jnp.int32)
    g = 1
    while g < LANES:
        in_lower = (lane & (2 * g - 1)) < g
        cl = pltpu.roll(c, g, axis=1)    # neighbor count from g lanes down
        cr = pltpu.roll(c, LANES - g, axis=1)   # ... from g lanes up (cyclic)
        a = jnp.where(in_lower, c, cl)       # lower-half count of the pair
        chi = jnp.where(in_lower, cr, c)     # upper-half count of the pair
        t = lane & (2 * g - 1)
        b = lane - t
        src = jnp.where(t < a, lane, b + g + (t - a))
        s = jnp.take_along_axis(s, jnp.clip(src, 0, LANES - 1), axis=1)
        c = a + chi
        g *= 2
    return s, c[:, :1]


def _row_prefix(crow):
    """Exclusive prefix over rows of a (W, 1) int32 column (log shifts)."""
    w = crow.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    incl = crow
    d = 1
    while d < w:
        sh = jnp.where(row >= d, pltpu.roll(incl, d, axis=0), 0)
        incl = incl + sh
        d *= 2
    return incl - crow, incl


def _mm_onehot(P, x, planes: int = 4):
    """Exact gather-matmul: P (Wo, W) one-hot int8, x (W, 128) int32 with
    values fitting `planes` 8-bit planes (planes=4: any int32, two's-
    complement wraparound; planes<4: requires 0 <= x < 2^(8*planes) —
    every plane is masked on recombine, so partial-plane values are exact;
    masked parts are lane-disjoint so each output element receives exactly
    one source term)."""
    ps = [((x >> (8 * i)) & 0xFF).astype(jnp.int8) for i in range(planes)]
    xp = jnp.concatenate(ps, axis=1) if planes > 1 else ps[0]
    y = jax.lax.dot_general(P, xp, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    L = LANES
    if planes == 4:
        return ((y[:, 0:L] & 0xFF) | ((y[:, L:2 * L] & 0xFF) << 8)
                | ((y[:, 2 * L:3 * L] & 0xFF) << 16) | (y[:, 3 * L:] << 24))
    out = y[:, 0:L] & 0xFF
    for i in range(1, planes):
        out = out | ((y[:, i * L:(i + 1) * L] & 0xFF) << (8 * i))
    return out


def _window_compact(m, arrays, fills, out_w: int | None = None,
                    planes=None, with_local_ids: bool = False):
    """Compact one (W, 128) window by mask `m`.

    arrays: list of int32 (W, 128) payloads moved through the compaction;
    fills: per-array fill value for slots past the window's count;
    out_w: output rows (<= W; default W).  Window counts beyond
    out_w*128 are cut — the CALLER must report max(total - out_w*128, 0)
    as overflow;
    planes: per-array int8 plane counts for the placement matmuls;
    with_local_ids: prepend an output of the window-local element index
    of each kept element (< W*128, from the map itself — no gather),
    moved with 2 planes (W <= 512).
    Returns (outs, total): outs[i] (out_w, 128), total = scalar count
    (uncapped)."""
    w = m.shape[0]
    ow = out_w or w
    if with_local_ids:
        assert w * LANES <= (1 << 16), "local ids must fit 2 planes"
    if planes is None:
        planes = [4] * len(arrays)
    lane = jax.lax.broadcasted_iota(jnp.int32, (w, LANES), 1)
    s, crow = _lane_compact_map(m)
    cx, incl = _row_prefix(crow)
    # reduce to a SCALAR (proven Mosaic path: scalar -> jnp.full/compare
    # broadcasts; (1,1) vectors cannot broadcast to 2 axes)
    total = jnp.sum(incl[w - 1:w, :], dtype=jnp.int32)
    shift = cx & (LANES - 1)
    d1 = cx >> 7                                      # (W, 1) dest row
    rot_idx = (lane - shift) & (LANES - 1)
    # one-hot routing matrices (dest-row o <- source-row r); dest rows
    # >= ow simply have no one-hot match (the cut is the overflow)
    o_i = jax.lax.broadcasted_iota(jnp.int32, (ow, w), 0)
    d1_row = jnp.swapaxes(d1, 0, 1)                   # (1, W)
    P1 = (o_i == d1_row).astype(jnp.int8)
    P2 = (o_i == d1_row + 1).astype(jnp.int8)
    tA = lane - shift                                 # rank if no wrap
    partA = (lane >= shift) & (tA < crow)
    partB = (lane < shift) & (tA + LANES < crow)
    opos = jax.lax.broadcasted_iota(jnp.int32, (ow, LANES), 0) * LANES \
        + jax.lax.broadcasted_iota(jnp.int32, (ow, LANES), 1)
    live = opos < total
    row = jax.lax.broadcasted_iota(jnp.int32, (w, LANES), 0)
    srcs, plns, fls = [], [], []
    if with_local_ids:
        # local id of the o-th kept element in row r = r*128 + s[r,o]:
        # the map IS the data (w<=512 -> ids < 2^16 -> 2 planes); dead
        # slots get -1 so callers can rebase live ids (id 0 is valid)
        srcs.append(row * LANES + s)
        plns.append(2)
        fls.append(-1)
    for x, p, f in zip(arrays, planes, fills):
        srcs.append(jnp.take_along_axis(x, s, axis=1))
        plns.append(p)
        fls.append(f)
    outs = []
    for ck, p, fill in zip(srcs, plns, fls):
        ck = jnp.where(lane < crow, ck, 0)
        rk = jnp.take_along_axis(ck, rot_idx, axis=1)
        xa = jnp.where(partA, rk, 0)
        xb = jnp.where(partB, rk, 0)
        o = _mm_onehot(P1, xa, p) + _mm_onehot(P2, xb, p)
        outs.append(jnp.where(live, o, fill))
    return outs, total


def _decode256(codes, table_block):
    """In-kernel 256-entry dictionary decode of a (W, 128) code block.
    table_block: (2, 128) — entry e at (e >> 7, e & 127).  Two lane
    gathers + one select (no serialized HBM gathers)."""
    w = codes.shape[0]
    idx = codes & (LANES - 1)
    lo = jnp.take_along_axis(
        jnp.broadcast_to(table_block[0:1, :], (w, LANES)), idx, axis=1)
    hi = jnp.take_along_axis(
        jnp.broadcast_to(table_block[1:2, :], (w, LANES)), idx, axis=1)
    return jnp.where(codes >= LANES, hi, lo)


def _make_kernel(w: int, ow: int, narr: int, planes, fills,
                 with_ids: bool, base_elems: int, ndict: int = 0,
                 in_u8: bool = False):
    """Grid kernel: col-window mask + payloads -> compacted block + count.

    with_ids: prepend the global element index as payload 0 (free: it is
    the compaction map itself plus the window base, added in-kernel).
    ndict: number of trailing (2, 128) dictionary inputs; each decodes the
    LAST compacted payload (the code column) into one extra output.
    in_u8: the mask column arrives as uint8 (the scan modes' native
    dtype) — widened in VMEM, never in HBM."""

    def kernel(lohi_ref, m_ref, *refs):
        ins = list(refs[:narr])
        dicts = list(refs[narr:narr + ndict])
        nout = narr + (1 if with_ids else 0) + ndict
        outs = list(refs[narr + ndict:narr + ndict + nout])
        cnt_ref = refs[-1]
        x = m_ref[:]
        if in_u8:
            x = x.astype(jnp.int32)
        lo = lohi_ref[0]
        hi = lohi_ref[1]
        m = (x >= lo) & (x <= hi)
        arrays = [r[:] for r in ins]
        res, total = _window_compact(
            m, arrays, list(fills), out_w=ow, planes=list(planes),
            with_local_ids=with_ids)
        if with_ids:
            base = pl.program_id(0) * base_elems
            res[0] = jnp.where(res[0] >= 0, res[0] + base,
                               jnp.int32(PAD_S_INPUT))
        if dicts:
            code_block = res[len(res) - 1]
            for d in dicts:
                res.append(_decode256(code_block, d[:2]))
        for o_ref, o in zip(outs, res):
            o_ref[0] = o
        # (1, 8, LANES) block: TPU tiling needs the last two block dims
        # >= (8, 128); scalar fill broadcasts fine
        cnt_ref[0] = jnp.full((8, LANES), total, jnp.int32)

    return kernel


def _ceil8(x: int) -> int:
    return max(8, -(-x // 8) * 8)


HINT_LADDER = (0.02, 0.1, 0.3, 0.6, 1.0)


def hint_ladder(sel: float | None) -> float | None:
    """Quantize a selectivity hint to a small ladder so jit caches stay
    warm across nearby selectivities (sel_hint is a static argument)."""
    if sel is None:
        return None
    for f in HINT_LADDER:
        if sel <= f:
            return f
    return 1.0


def out_w_for(w: int, sel_hint: float | None, margin: float = 1.35) -> int:
    """Selectivity-scaled output rows per window: enough for sel_hint *
    margin plus binomial fluctuation, rounded to whole sublane groups.
    None -> full width (no cut possible)."""
    if sel_hint is None:
        return w
    frac = min(1.0, max(0.0, sel_hint) * margin + 6.0 / w)
    return min(w, _ceil8(int(w * frac) + 8))


@functools.partial(jax.jit, static_argnames=("w", "ow", "interpret",
                                             "with_ids", "fills", "planes",
                                             "in_u8"))
def _compact_windows(col, payloads, lo, hi, w: int, interpret: bool,
                     with_ids: bool, fills, dict_tables=(), ow: int = 0,
                     planes=(), in_u8: bool = False):
    """Run the window kernel over the whole column.

    dict_tables: optional (2, 128)-shaped 256-entry dictionaries; each
    adds one decoded output of the last payload (the code column).
    Returns (list of (nb, ow, 128) compacted blocks, counts (nb,)) —
    counts are UNCAPPED (callers derive overflow past ow*128)."""
    n = col.shape[0]
    block = w * LANES
    pad = (-n) % block
    if in_u8:
        sent = jnp.uint8(255)  # callers guarantee hi < 255 or no pad
        assert col.dtype == jnp.uint8
    else:
        sent = jnp.int32(jnp.iinfo(jnp.int32).min)
    if pad:
        col = jnp.concatenate([col, jnp.full((pad,), sent, col.dtype)])
        payloads = [jnp.concatenate([p, jnp.zeros((pad,), jnp.int32)])
                    for p in payloads]
    ow = ow or w
    nb = col.shape[0] // block
    narr = len(payloads)
    ndict = len(dict_tables)
    if not planes:
        planes = (4,) * narr
    nout = narr + (1 if with_ids else 0) + ndict
    lohi = jnp.stack([jnp.asarray(lo, jnp.int32),
                      jnp.asarray(hi, jnp.int32)])
    blockspec_in = [pl.BlockSpec((w, LANES), lambda i, s: (i, 0))] * (
        1 + narr) + [pl.BlockSpec((8, LANES), lambda i, s: (0, 0))] * ndict
    out_specs = [pl.BlockSpec((1, ow, LANES), lambda i, s: (i, 0, 0))
                 ] * nout + [pl.BlockSpec((1, 8, LANES),
                                          lambda i, s: (i, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((nb, ow, LANES), jnp.int32)] * nout + [
        jax.ShapeDtypeStruct((nb, 8, LANES), jnp.int32)]
    outs = pl.pallas_call(
        _make_kernel(w, ow, narr, planes, fills, with_ids, block, ndict,
                     in_u8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=blockspec_in,
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(lohi, col.reshape(-1, LANES),
      *[p.reshape(-1, LANES) for p in payloads],
      *[jnp.concatenate([d, jnp.zeros((6, LANES), jnp.int32)])
        for d in dict_tables])
    blocks = outs[:nout]
    counts = outs[nout][:, 0, 0]
    return blocks, counts


def _assemble(blocks, counts, ow: int, cap_rows: int, nb: int,
              fill_keys, interpret: bool):
    """Concatenate per-window compacted blocks with row-granular DMAs.
    Boundary rows may carry pads (block-granular contract).  Returns
    (arrays, count, overflow) — overflow counts BOTH window cuts
    (count > ow*128) and capacity truncation."""
    from aqp_tpu.ops.pallas.compact import scatter_segments_one

    kept = jnp.minimum(counts, ow * LANES)
    cut = jnp.sum(counts - kept, dtype=jnp.int32)
    rows = -(-kept // LANES)                          # ceil to whole rows
    doff = jnp.cumsum(rows) - rows
    ovf = jnp.maximum(doff[-1] + rows[-1] - cap_rows, 0) + cut
    # clamp segments to the output buffer BEFORE issuing DMAs: past-capacity
    # destination offsets would be OOB HBM writes in the compiled kernel
    # (ADVICE r4); ovf above remains the reported truncation signal
    rows = jnp.clip(jnp.minimum(rows, cap_rows - doff), 0, None)
    doff = jnp.minimum(doff, cap_rows)
    soff = jnp.arange(nb, dtype=jnp.int32) * ow
    total = jnp.sum(kept, dtype=jnp.int32)
    outs = []
    flat = [b.reshape(nb * ow, LANES) for b in blocks]
    i = 0
    while i < len(flat):
        if i + 1 < len(flat):
            ok, op = scatter_segments(
                flat[i], flat[i + 1], soff, doff, rows, nb, cap_rows + 1,
                fill_key=int(fill_keys[i]), interpret=interpret)
            outs.append(ok[:cap_rows].reshape(-1))
            outs.append(op[:cap_rows].reshape(-1))
            i += 2
        else:
            ok = scatter_segments_one(
                flat[i], soff, doff, rows, nb, cap_rows + 1,
                fill_key=int(fill_keys[i]), interpret=interpret)
            outs.append(ok[:cap_rows].reshape(-1))
            i += 1
    return outs, total, ovf


@functools.partial(jax.jit, static_argnames=("cap_rows", "w", "sel_hint",
                                             "interpret"))
def scan_index_fast(col, low, high, cap_rows: int, w: int = 512,
                    sel_hint: float | None = None,
                    interpret: bool = False):
    """Implicit index scan via the lane compactor (uint8-native column).

    Returns (rowids[cap_rows*128], count, overflow); pad slots carry
    PAD_S_INPUT, only in block-boundary rows.  sel_hint (0..1) scales the
    per-window output buffers; a hint too low for the data is REPORTED as
    overflow (callers rerun with sel_hint=None)."""
    in_u8 = bool(col.dtype == jnp.uint8
                 and col.shape[0] % (w * LANES) == 0)  # pad sentinel guard
    x = col if in_u8 else col.astype(jnp.int32)
    ow = out_w_for(w, sel_hint)
    blocks, counts = _compact_windows(
        x, [], jnp.asarray(low, jnp.int32), jnp.asarray(high, jnp.int32),
        w, interpret, with_ids=True, fills=(), ow=ow, in_u8=in_u8)
    nb = counts.shape[0]
    outs, total, ovf = _assemble(blocks, counts, ow, cap_rows, nb,
                                 [PAD_S_INPUT], interpret)
    return outs[0], total, ovf


@functools.partial(jax.jit, static_argnames=("cap_rows", "w", "sel_hint",
                                             "interpret"))
def scan_values_fast(col, low, high, cap_rows: int, w: int = 512,
                     sel_hint: float | None = None,
                     interpret: bool = False):
    """Value scan via the lane compactor.

    Returns (rowids, values, count, overflow).  The 8-bit value column
    rides ONE int8 plane through the placement matmuls."""
    in_u8 = bool(col.dtype == jnp.uint8
                 and col.shape[0] % (w * LANES) == 0)
    x = col if in_u8 else col.astype(jnp.int32)
    xv = col.astype(jnp.int32) if in_u8 else x
    ow = out_w_for(w, sel_hint)
    blocks, counts = _compact_windows(
        x, [xv], jnp.asarray(low, jnp.int32), jnp.asarray(high, jnp.int32),
        w, interpret, with_ids=True, fills=(0,), ow=ow,
        planes=(1,), in_u8=in_u8)  # 8-bit codes ride one plane
    nb = counts.shape[0]
    outs, total, ovf = _assemble(blocks, counts, ow, cap_rows, nb,
                                 [PAD_S_INPUT, 0], interpret)
    return outs[0], outs[1], total, ovf


@functools.partial(jax.jit, static_argnames=("cap_rows", "w", "sel_hint",
                                             "interpret"))
def scan_dict_fast(col, dict_lo, dict_hi, low, high, cap_rows: int,
                   w: int = 512, sel_hint: float | None = None,
                   interpret: bool = False):
    """Dict scan via the lane compactor: qualifying 8-bit codes compacted
    and decoded IN-KERNEL through a 256-entry dictionary stored as two
    int32 planes (SIMD512.cpp:320-335's `i64gather` through the dict; the
    plane split is the established TPU-native 64-bit layout).

    Returns (rowids, lo_plane, hi_plane, count, overflow)."""
    in_u8 = bool(col.dtype == jnp.uint8
                 and col.shape[0] % (w * LANES) == 0)
    x = col if in_u8 else col.astype(jnp.int32)
    xv = col.astype(jnp.int32) if in_u8 else x
    tlo = dict_lo.astype(jnp.int32).reshape(2, LANES)
    thi = dict_hi.astype(jnp.int32).reshape(2, LANES)
    ow = out_w_for(w, sel_hint)
    blocks, counts = _compact_windows(
        x, [xv], jnp.asarray(low, jnp.int32), jnp.asarray(high, jnp.int32),
        w, interpret, with_ids=True, fills=(0,), ow=ow, planes=(1,),
        dict_tables=(tlo, thi), in_u8=in_u8)
    nb = counts.shape[0]
    # blocks: ids, codes, dlo, dhi — assemble ids+dlo and dhi (codes are
    # not part of the output contract)
    outs, total, ovf = _assemble(
        [blocks[0], blocks[2], blocks[3]], counts, ow, cap_rows, nb,
        [PAD_S_INPUT, 0, 0], interpret)
    return outs[0], outs[1], outs[2], total, ovf


@functools.partial(jax.jit, static_argnames=("cap_rows", "w", "pad_key",
                                             "keep_frac", "interpret"))
def compact_kp_fast(key, payload, cap_rows: int, w: int = 512,
                    pad_key: int = PAD_S_INPUT,
                    keep_frac: float | None = None,
                    interpret: bool = False):
    """Drop-in fast variant of compact.compact_kp: compact (key, payload)
    rows where key < PAD_R_INPUT.  Returns (key, payload, overflow) with
    the same block-granular pad contract.  keep_frac scales the
    per-window buffers (skew-residual / filter callers know their keep
    rate); overshoot is reported via overflow."""
    # lo excludes int32 min: that's the internal padding sentinel of
    # _compact_windows (real keys are >= the -3 hole sentinel anyway)
    ow = out_w_for(w, keep_frac)
    blocks, counts = _compact_windows(
        key, [key, payload], jnp.int32(-(2 ** 31) + 1),
        jnp.int32(PAD_R_INPUT - 1),
        w, interpret, with_ids=False, fills=(pad_key, 0), ow=ow)
    nb = counts.shape[0]
    outs, total, ovf = _assemble(blocks, counts, ow, cap_rows, nb,
                                 [pad_key, 0], interpret)
    return outs[0], outs[1], ovf


@functools.partial(jax.jit, static_argnames=("cap_rows", "w", "pad_key",
                                             "keep_frac", "interpret"))
def compact_k_fast(key, cap_rows: int, w: int = 512,
                   pad_key: int = PAD_S_INPUT,
                   keep_frac: float | None = None,
                   interpret: bool = False):
    """Keys-only compaction (the keys-only serving paths move no payload
    lanes).  Returns (key, overflow)."""
    ow = out_w_for(w, keep_frac)
    blocks, counts = _compact_windows(
        key, [key], jnp.int32(-(2 ** 31) + 1), jnp.int32(PAD_R_INPUT - 1),
        w, interpret, with_ids=False, fills=(pad_key,), ow=ow)
    nb = counts.shape[0]
    outs, total, ovf = _assemble(blocks, counts, ow, cap_rows, nb,
                                 [pad_key], interpret)
    return outs[0], ovf
