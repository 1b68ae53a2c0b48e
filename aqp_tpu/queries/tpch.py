"""TPC-H Q3/Q10/Q12/Q19 physical plans.

Reference: lib/TPCH-Queries/src/tpch.cpp:36-309 — hand-written plans chaining
SIMD filter → join → result-transform → join → final filter, with per-phase
cycle timers (selection_1..3, join_1..3, copy) printed for the harness.

TPU design: each stage is a jitted program over fixed-capacity columns;
result transformers (result_transformers.hpp:48-80) are payload gathers.
Join algorithm is selectable by name exactly as the reference's `-a` flag.
"""

from __future__ import annotations

import functools
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp

from aqp_tpu.config import JoinConfig
from aqp_tpu.ops import mergejoin
from aqp_tpu.joins.api import run_join
from aqp_tpu.queries import filters as F
from aqp_tpu.queries import tables as T
from aqp_tpu.relation import Relation
from aqp_tpu.utils.timing import PhaseTimer, Timings


class QueryResult(NamedTuple):
    matches: int
    timings: Timings


def _run_join(rk, rp, sk, sp, algorithm, materialize):
    cfg = JoinConfig(materialize=materialize)
    res, _ = run_join(
        Relation(rk, rp), Relation(sk, sp), algorithm, cfg
    )
    return res


def tpch_q3(c: T.CustomerTable, o: T.OrdersTable, l: T.LineItemTable,
            algorithm: str = "RHO") -> QueryResult:
    """Q3: σ(customer) ⋈ σ(orders) → rekey → ⋈ σ(lineitem)  (tpch.cpp:36-115)."""
    pt = PhaseTimer()
    t0 = time.perf_counter()
    ck, cp, _ = pt.time_fn("filter", F.q3_filter_customer, c)
    ok, op, _ = pt.time_fn("filter", F.q3_filter_orders, o)
    j1 = _run_join(ck, cp, ok, op, algorithm, materialize=True)
    jax.block_until_ready(j1.key)
    pt.t.phases["join"] = time.perf_counter() - t0 - sum(pt.t.phases.values())
    # transform copy_Sp_Sp (result_transformers.hpp:66+): U.key = U.payload =
    # the S payload (o_orderkey value)
    tc0 = time.perf_counter()
    uk = j1.s_payload
    up = j1.s_payload
    # the materialized tail keys are -3; o_orderkey values are >= 1
    jax.block_until_ready(uk)
    pt.t.phases["materialize"] = time.perf_counter() - tc0
    lk, lp, _ = pt.time_fn("filter", F.q3_filter_lineitem, l)
    tj2 = time.perf_counter()
    j2 = _run_join(uk, up, lk, lp, algorithm, materialize=False)
    jax.block_until_ready(j2.matches)
    pt.t.phases["join"] += time.perf_counter() - tj2
    pt.t.phases["total"] = time.perf_counter() - t0
    pt.t.rows_in = c.num_tuples + o.num_tuples + l.num_tuples
    pt.t.matches = int(j2.matches)
    return QueryResult(int(j2.matches), pt.t)


@jax.jit
def _q10_transform1(nationkey_col, r_payload, s_payload, key):
    """copy_RpToKeySp: out.key = c_nationkey[Rpayload], out.payload = Spayload
    (result_transformers.cpp, tpch.cpp:150-156).  Invalid rows (key == -3)
    keep a -3 key."""
    valid = key != -3
    nk = nationkey_col[jnp.where(valid, r_payload, 0)]
    return jnp.where(valid, nk, -3), jnp.where(valid, s_payload, 0)


@jax.jit
def _q10_transform2(o_key_col, r_payload, s_payload, key):
    """copy_SpToTupleST: out = o_orderkey[Spayload] → (orderkey value, orders
    rowID) (tpch.cpp:176-182)."""
    valid = key != -3
    okey = o_key_col[jnp.where(valid, s_payload, 0)]
    return jnp.where(valid, okey, -3), jnp.where(valid, s_payload, 0)


def tpch_q10(c: T.CustomerTable, o: T.OrdersTable, l: T.LineItemTable,
             n: T.NationTable, algorithm: str = "RHO") -> QueryResult:
    """Q10: C ⋈ σ(orders) → nationkey rekey → N ⋈ U → orderkey rekey →
    ⋈ σ(lineitem)  (tpch.cpp:117-216)."""
    pt = PhaseTimer()
    t0 = time.perf_counter()
    ok, op, _ = pt.time_fn("filter", F.q10_filter_orders, o)
    tj = time.perf_counter()
    j1 = _run_join(c.key, c.rowid, ok, op, algorithm, materialize=True)
    jax.block_until_ready(j1.key)
    pt.t.phases["join"] = time.perf_counter() - tj
    uk, up = pt.time_fn(
        "materialize", _q10_transform1, c.nationkey, j1.r_payload, j1.s_payload, j1.key
    )
    tj = time.perf_counter()
    j2 = _run_join(n.key, n.rowid, uk, up, algorithm, materialize=True)
    jax.block_until_ready(j2.key)
    pt.t.phases["join"] += time.perf_counter() - tj
    vk, vp = pt.time_fn(
        "materialize", _q10_transform2, o.key, j2.r_payload, j2.s_payload, j2.key
    )
    lk, lp, _ = pt.time_fn("filter", F.q10_filter_lineitem, l)
    tj = time.perf_counter()
    j3 = _run_join(vk, vp, lk, lp, algorithm, materialize=False)
    jax.block_until_ready(j3.matches)
    pt.t.phases["join"] += time.perf_counter() - tj
    pt.t.phases["total"] = time.perf_counter() - t0
    pt.t.rows_in = c.num_tuples + o.num_tuples + l.num_tuples + n.num_tuples
    pt.t.matches = int(j3.matches)
    return QueryResult(int(j3.matches), pt.t)


def tpch_q12(l: T.LineItemTable, o: T.OrdersTable,
             algorithm: str = "RHO") -> QueryResult:
    """Q12: O ⋈ σ(lineitem), single join, count  (tpch.cpp:218-252)."""
    pt = PhaseTimer()
    t0 = time.perf_counter()
    lk, lp, _ = pt.time_fn("filter", F.q12_filter_lineitem, l)
    tj = time.perf_counter()
    j = _run_join(o.key, o.rowid, lk, lp, algorithm, materialize=False)
    jax.block_until_ready(j.matches)
    pt.t.phases["join"] = time.perf_counter() - tj
    pt.t.phases["total"] = time.perf_counter() - t0
    pt.t.rows_in = l.num_tuples + o.num_tuples
    pt.t.matches = int(j.matches)
    return QueryResult(int(j.matches), pt.t)


def tpch_q19(l: T.LineItemTable, p: T.PartTable,
             algorithm: str = "RHO") -> QueryResult:
    """Q19: σ(part) ⋈ σ(lineitem) materialized, then the exact disjunctive
    residual predicate per output row via rowID lookups  (tpch.cpp:254-309)."""
    pt = PhaseTimer()
    t0 = time.perf_counter()
    pk, pp, _ = pt.time_fn("filter", F.q19_filter_part, p)
    lk, lp, _ = pt.time_fn("filter", F.q19_filter_lineitem, l)
    tj = time.perf_counter()
    j = _run_join(pk, pp, lk, lp, algorithm, materialize=True)
    jax.block_until_ready(j.key)
    pt.t.phases["join"] = time.perf_counter() - tj

    # The region-chunked join output is capacity-sized (~2.5x the real
    # matches at sf>=10); COMPACT it before the residual's per-row base-
    # table lookups — otherwise the gathers run at hole-capacity size
    # (measured 45-60 s/rep at sf=10).
    res_cap = max(128, -(-lk.shape[0] // 128) * 128)

    @functools.partial(jax.jit, static_argnames=("cap",))
    def residual(key, r_payload, s_payload, cap: int):
        cm = mergejoin.compact_matches(key != -3, key, r_payload,
                                       s_payload, capacity=cap)
        valid = cm.key != -3
        keep = F.q19_residual_predicate(p, l, cm.r_payload, cm.s_payload,
                                        valid)
        return jnp.sum(keep, dtype=jnp.int32)

    matches = int(pt.time_fn("filter", residual, j.key, j.r_payload,
                             j.s_payload, res_cap))
    pt.t.phases["total"] = time.perf_counter() - t0
    pt.t.rows_in = l.num_tuples + p.num_tuples
    pt.t.matches = matches
    return QueryResult(matches, pt.t)
