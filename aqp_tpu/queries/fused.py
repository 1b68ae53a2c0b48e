"""Fused TPC-H plans: each query as ONE jitted program with bounded buffers.

The staged plans in queries/tpch.py keep jit boundaries between phases for
per-phase timing (the reference's selection_1../join_1.. timer contract,
tpch.cpp:36-309).  On hardware behind a dispatch tunnel (~25 ms per device
call) a 5-stage plan pays ~125 ms of pure overhead, so the serving path
fuses filter → join → transform → join (→ residual) into a single XLA
program: one dispatch, full operator fusion, no host round-trips.

Two backends, chosen at trace time:

* TPU: COUNT joins run the champion Pallas pipeline (ops/pallas/rho3.py,
  keys-only mode) with the predicate pushed INTO the join — invalid rows
  are remapped to pad keys ([MAX_KEY, 2^30)) and dropped by the pipeline's
  own partition pass, so filters cost one fused elementwise pass and zero
  compaction.  MATERIALIZE joins run the XLA union-sort core over
  Pallas-compacted bounded inputs (ops/pallas/compact.compact_kp — one
  block sort + row DMAs instead of an XLA 3-array sort, ~9x at 60M rows).
* CPU (tests / fallback): XLA sort-based compaction + union-sort joins.

Selection pushdown under static shapes: each buffer is a fixed fraction of
its table sized ~1.5x the predicate's TPC-H selectivity, and every bound is
overflow-checked — each query returns (matches, ok); ok=False means a bound
was exceeded (non-TPC-H data) and the caller must fall back to the staged
full-capacity plan (queries/tpch.py).  tests/test_tpch_fused.py pins
fused == staged match counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aqp_tpu.ops import mergejoin
from aqp_tpu.ops.pallas.compact import (
    PAD_R_INPUT,
    PAD_S_INPUT,
    compact_kp,
)
from aqp_tpu.ops.pallas.rho3 import (
    rho_join_count_v3,
    rho_join_materialize_v3,
)
from aqp_tpu.queries import filters as F
from aqp_tpu.queries import tables as T


def _use_pallas() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


def _cap(n: int, num: int, den: int) -> int:
    """Bounded-buffer capacity in ELEMENTS: ceil(n*num/den), 128*256-aligned
    (whole rows for the Pallas compactor), <= n."""
    c = -(-n * num // den)
    return min(n, -(-c // 32768) * 32768) if n >= 32768 else n


def _masked(mask, key, payload, pad):
    return jnp.where(mask, key, pad), jnp.where(mask, payload, 0)


def _compact(mask, key, payload, cap_elems: int, pad):
    """Bounded compaction: the lane compactor on TPU (no sort — 7 lane
    stages + MXU row scatter, ops/pallas/lanecompact.py) with
    selectivity-scaled windows (the capacity IS the keep-rate bound;
    overshoot is reported), XLA sort on CPU.
    Returns (key[cap], payload[cap], ok)."""
    if _use_pallas() and key.shape[0] >= 32768 and cap_elems % 128 == 0:
        from aqp_tpu.ops.pallas.lanecompact import compact_kp_fast

        mk, mp = _masked(mask, key, payload, pad)
        kf = min(1.0, cap_elems / key.shape[0])
        k, p, ovf = compact_kp_fast(mk, mp, cap_elems // 128, pad_key=pad,
                                    keep_frac=kf)
        return k, p, ovf == 0
    k, p, count = F._compact_kp(mask, key, payload, pad)
    return k[:cap_elems], p[:cap_elems], count <= cap_elems


def _compact_keys(mask, key, cap_elems: int, pad):
    """Keys-only bounded compaction for count-join probe sides (the
    keys-only pipeline never reads payloads).  Returns (key[cap], ok)."""
    if _use_pallas() and key.shape[0] >= 32768 and cap_elems % 128 == 0:
        from aqp_tpu.ops.pallas.lanecompact import compact_k_fast

        mk = jnp.where(mask, key, pad)
        kf = min(1.0, cap_elems / key.shape[0])
        k, ovf = compact_k_fast(mk, cap_elems // 128, pad_key=pad,
                                keep_frac=kf)
        return k, ovf == 0
    k, _, count = F._compact_kp(mask, key, key, pad)
    return k[:cap_elems], count <= cap_elems


def _mat_join(rk, rp, sk, sp, capacity: int):
    """Materializing join for the plans' middle stages: the champion Pallas
    materializer on TPU at scale (region-chunked output, holes keyed -3 —
    identical sentinel to the XLA core's tail), XLA union-sort core
    otherwise.  Returns (JoinMaterialized, ok)."""
    if _use_pallas() and rk.shape[0] + sk.shape[0] >= (1 << 23):
        m, c, ok, orp, osp, ovf = rho_join_materialize_v3(rk, rp, sk, sp)
        return mergejoin.JoinMaterialized(m, c, ok, orp, osp), ovf == 0
    j = mergejoin.merge_join_materialize(rk, rp, sk, sp, capacity)
    # the XLA core truncates at capacity — report, never silently drop
    return j, j.matches <= capacity


def _count_join(rk, rp, sk, sp):
    """Count join: champion Pallas pipeline on TPU (keys-only mode, input
    pads dropped by its own partition pass), XLA union-sort core on CPU.
    Returns (matches, ok)."""
    if _use_pallas():
        m, _, ovf = rho_join_count_v3(rk, rp, sk, sp, with_checksum=False)
        return m, ovf == 0
    j = mergejoin.merge_join_count(rk, rp, sk, sp)
    return j.matches, jnp.bool_(True)


@jax.jit
def tpch_q3_fused(c: T.CustomerTable, o: T.OrdersTable, l: T.LineItemTable):
    """Q3 fused: σ(C) ⋈ σ(O) → rekey(Sp,Sp) → ⋈ σ(L).  (tpch.cpp:36-115)

    Returns (matches, ok).  Capacity fractions ~1.5x the TPC-H predicate
    selectivities (mktsegment=BUILDING 20%, date<1995-03-15 47%,
    shipdate>=1995-03-16 53%)."""
    nc, no, nl = c.key.shape[0], o.key.shape[0], l.key.shape[0]
    ck, cp, ok1 = _compact(*F.q3_mask_customer(c), _cap(nc, 5, 16), PAD_R_INPUT)
    okey, opay, ok2 = _compact(*F.q3_mask_orders(o), _cap(no, 5, 8), PAD_S_INPUT)
    j1, okj = _mat_join(ck, cp, okey, opay, okey.shape[0])
    # copy_Sp_Sp (result_transformers.hpp:66+): key = payload = o_orderkey
    uk = jnp.where(j1.key == -3, PAD_R_INPUT, j1.s_payload)
    lmask, lkey, _ = F.q3_mask_lineitem(l)
    lk, okc = _compact_keys(lmask, lkey, _cap(nl, 3, 4), PAD_S_INPUT)
    m, ok3 = _count_join(uk, j1.s_payload, lk, jnp.zeros_like(lk))
    return m, ok1 & ok2 & okj & okc & ok3


@jax.jit
def tpch_q10_fused(c: T.CustomerTable, o: T.OrdersTable, l: T.LineItemTable,
                   n: T.NationTable):
    """Q10 fused: C ⋈ σ(O) → nationkey rekey → N ⋈ U → orderkey rekey →
    ⋈ σ(L).  (tpch.cpp:117-216)  Selectivities: orders date-in-quarter
    ~3.8%, returnflag=R ~33%."""
    no, nl = o.key.shape[0], l.key.shape[0]
    ok_, op_, okf = _compact(*F.q10_mask_orders(o), _cap(no, 1, 16), PAD_S_INPUT)
    j1, okj1 = _mat_join(c.key, c.rowid, ok_, op_, ok_.shape[0])
    valid = j1.key != -3
    # invalid rows -> the S-side pad key (dropped by either backend; -3
    # would count as a domain violation in the Pallas pipeline)
    uk = jnp.where(valid, c.nationkey[jnp.where(valid, j1.r_payload, 0)],
                   PAD_S_INPUT)
    up = jnp.where(valid, j1.s_payload, 0)
    j2, okj2 = _mat_join(n.key, n.rowid, uk, up, uk.shape[0])
    valid = j2.key != -3
    vk = jnp.where(valid, o.key[jnp.where(valid, j2.s_payload, 0)], PAD_R_INPUT)
    vp = jnp.where(valid, j2.s_payload, 0)
    lmask, lkey, _ = F.q10_mask_lineitem(l)
    lk, okc = _compact_keys(lmask, lkey, _cap(nl, 1, 2), PAD_S_INPUT)
    m, okl = _count_join(vk, vp, lk, jnp.zeros_like(lk))
    return m, okf & okj1 & okj2 & okc & okl


@jax.jit
def tpch_q12_fused(l: T.LineItemTable, o: T.OrdersTable):
    """Q12 fused: O ⋈ σ(L), count.  (tpch.cpp:218-252)  The 5-way lineitem
    predicate keeps ~0.5% of rows, so the probe side is compacted through
    the selectivity-scaled lane compactor before the keys-only count join
    (compacting 60M -> ~400k shrinks the join's sort network ~4x)."""
    nl = l.key.shape[0]
    lmask, lkey, _ = F.q12_mask_lineitem(l)
    lk, okc = _compact_keys(lmask, lkey, _cap(nl, 1, 48), PAD_S_INPUT)
    m, okl = _count_join(o.key, o.rowid, lk, jnp.zeros_like(lk))
    return m, okc & okl


@jax.jit
def tpch_q19_fused(l: T.LineItemTable, p: T.PartTable):
    """Q19 fused as ONE keys-only count join on BAND-CLASS COMPOSITE KEYS.

    The reference materializes σ(P) ⋈ σ(L) and re-evaluates the exact
    disjunctive residual per output row via rowID gathers
    (q19FinalPredicate, Q19Predicates.hpp:58-78; tpch.cpp:254-309).  The
    TPU-native form FOLDS the residual into the join key:

      * each residual disjunct fixes an exact (brand, container-family,
        size) PART conjunction — a part satisfies at most one, its CLASS
        c ∈ {1,2,3} (class 0 parts can never appear in the result);
      * the quantity windows [1,11]/[10,20]/[20,30] partition into five
        DISJOINT BANDS [1,9][10,11][12,19][20][21,30]; class c accepts a
        fixed band set (c=1:{0,1}, c=2:{1,2,3}, c=3:{3,4});
      * R' = for each class-c part, one row per accepted band with key
        partkey*8 + band (<= 3 rows/part, globally unique keys);
        S' = each prefiltered lineitem probes partkey*8 + band(quantity).

    A pair matches iff it satisfies the full Q19 predicate, so the count
    join IS the query — no materialization, no gathers, no residual
    pass.  The probe side is compacted (~4%) before the join."""
    nl, np_ = l.key.shape[0], p.key.shape[0]
    b, ct, sz = p.brand, p.container, p.size
    c1 = (b == T.P_BRAND_12) & (ct >= 1) & (ct <= 4) & (sz >= 1) & (sz <= 5)
    c2 = (b == T.P_BRAND_23) & (ct >= 5) & (ct <= 8) & (sz >= 1) & (sz <= 10)
    c3 = (b == T.P_BRAND_34) & (ct >= 9) & (ct <= 12) & (sz >= 1) & (sz <= 15)
    cls = jnp.where(c1, 1, jnp.where(c2, 2, jnp.where(c3, 3, 0)))
    base = p.key * 8
    band0 = jnp.where(cls == 1, 0, jnp.where(cls == 2, 1,
                                             jnp.where(cls == 3, 3, -1)))
    band1 = jnp.where(cls == 1, 1, jnp.where(cls == 2, 2,
                                             jnp.where(cls == 3, 4, -1)))
    band2 = jnp.where(cls == 2, 3, -1)
    rk = jnp.concatenate([
        jnp.where(bb >= 0, base + bb, PAD_R_INPUT)
        for bb in (band0, band1, band2)])
    lmask, lkey, _ = F.q19_mask_lineitem(l)  # partkey out-key, qty/mode/instr
    q = l.quantity
    band = jnp.where(q <= 9, 0, jnp.where(q <= 11, 1,
                                          jnp.where(q <= 19, 2,
                                                    jnp.where(q == 20, 3,
                                                              4))))
    lk, okc = _compact_keys(lmask, lkey * 8 + band, _cap(nl, 1, 16),
                            PAD_S_INPUT)
    m, okj = _count_join(rk, jnp.zeros_like(rk), lk, jnp.zeros_like(lk))
    return m, okc & okj
