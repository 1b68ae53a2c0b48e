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
    stages + MXU row scatter, ops/pallas/lanecompact.py), XLA sort on CPU.
    Returns (key[cap], payload[cap], ok)."""
    if _use_pallas() and key.shape[0] >= 32768 and cap_elems % 128 == 0:
        from aqp_tpu.ops.pallas.lanecompact import compact_kp_fast

        mk, mp = _masked(mask, key, payload, pad)
        k, p, ovf = compact_kp_fast(mk, mp, cap_elems // 128, pad_key=pad)
        return k, p, ovf == 0
    k, p, count = F._compact_kp(mask, key, payload, pad)
    return k[:cap_elems], p[:cap_elems], count <= cap_elems


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
    lmask, lkey, lpay = F.q3_mask_lineitem(l)
    lk, lp = _masked(lmask, lkey, lpay, PAD_S_INPUT)
    m, ok3 = _count_join(uk, j1.s_payload, lk, lp)
    return m, ok1 & ok2 & okj & ok3


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
    lmask, lkey, lpay = F.q10_mask_lineitem(l)
    lk, lp = _masked(lmask, lkey, lpay, PAD_S_INPUT)
    m, okl = _count_join(vk, vp, lk, lp)
    return m, okf & okj1 & okj2 & okl


@jax.jit
def tpch_q12_fused(l: T.LineItemTable, o: T.OrdersTable):
    """Q12 fused: O ⋈ σ(L), count.  (tpch.cpp:218-252)  The 5-way lineitem
    predicate keeps ~0.3% of rows; the filter is pushed into the Pallas
    join's own partition pass."""
    nl = l.key.shape[0]
    lmask, lkey, lpay = F.q12_mask_lineitem(l)
    lk, lp = _masked(lmask, lkey, lpay, PAD_S_INPUT)
    m, okl = _count_join(o.key, o.rowid, lk, lp)
    return m, okl


@jax.jit
def tpch_q19_fused(l: T.LineItemTable, p: T.PartTable):
    """Q19 fused: σ(P) ⋈ σ(L) materialized, then the exact disjunctive
    residual per output row via rowID gathers.  (tpch.cpp:254-309)
    Prefilter selectivities: part ~14%, lineitem ~4%; join hit rate ~14%
    of filtered lineitems -> materialize capacity |L|/32."""
    nl, np_ = l.key.shape[0], p.key.shape[0]
    pk, pp, okp = _compact(*F.q19_mask_part(p), _cap(np_, 1, 4), PAD_R_INPUT)
    lk, lp, okl = _compact(*F.q19_mask_lineitem(l), _cap(nl, 1, 8), PAD_S_INPUT)
    mat_cap = _cap(nl, 1, 32)
    j, okj = _mat_join(pk, pp, lk, lp, mat_cap)
    valid = j.key != -3
    keep = F.q19_residual_predicate(p, l, j.r_payload, j.s_payload, valid)
    return jnp.sum(keep, dtype=jnp.int32), okp & okl & okj
