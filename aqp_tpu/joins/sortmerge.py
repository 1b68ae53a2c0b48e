"""Sort-merge join engines: PSM and MWAY equivalents.

Reference: parallel_sortmerge_join.cpp:76-118 (PSM: parallel 3-way quicksort
of both inputs + scalar merge-join) and sortmergejoin_multiway.cpp:90-537
(MWAY: radix partition → per-chunk sort → multi-way merge through
cache-resident FIFOs → merge-join).

TPU design: the sort IS the merge preparation — `lax.sort` produces globally
sorted relations (the multiway merge hierarchy is inside XLA's sort), and the
merge-join is a data-parallel propagation scan (ops/mergejoin.py) instead of
a sequential two-pointer walk.  MWAY's cache-sized-run structure maps to the
Tier-2 Pallas band-merge kernel operating on VMEM-sized tiles.
"""

from __future__ import annotations

import time

import jax

from aqp_tpu.config import JoinConfig
from aqp_tpu.joins.api import register
from aqp_tpu.joins.common import result_capacity, to_join_result
from aqp_tpu.ops import mergejoin
from aqp_tpu.relation import Relation
from aqp_tpu.utils.timing import PhaseTimer


def _sortmerge(relR: Relation, relS: Relation, cfg: JoinConfig):
    pt = PhaseTimer()
    t0 = time.perf_counter()
    # Phase "sort": pre-sort both inputs (PSM sorts R and S in place,
    # parallel_sortmerge_join.cpp:86-100).  The union sort in the merge core
    # re-merges them; pre-sorted inputs make that a cheap merge inside XLA.
    rk, rp = pt.time_fn(
        "sort", jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1)), relR.key, relR.payload
    )
    sk, sp = pt.time_fn(
        "sort", jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1)), relS.key, relS.payload
    )
    if cfg.materialize:
        out = pt.time_fn(
            "merge",
            lambda: mergejoin.merge_join_materialize(
                rk, rp, sk, sp, result_capacity(relS, cfg)
            ),
        )
    else:
        out = pt.time_fn("merge", lambda: mergejoin.merge_join_count(rk, rp, sk, sp))
    pt.t.phases["total"] = time.perf_counter() - t0
    return to_join_result(out), pt.t


@register("PSM")
def PSM(relR, relS, cfg):
    return _sortmerge(relR, relS, cfg)


@register("MWAY")
def MWAY(relR, relS, cfg):
    return _sortmerge(relR, relS, cfg)
