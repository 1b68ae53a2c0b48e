"""Join dispatcher — the TPU analog of `run_join` (lib/Joins/src/joins.cpp:33-78).

All 19 reference algorithm names are registered.  Each maps to a TPU-native
engine; several reference names share an engine with different configuration,
exactly as the reference maps 19 names onto ~8 cores (e.g. PHT/PHT_no/PHT_un
are one kernel family with unrolling/overflow variants — compile-time knobs
that are runtime kernel choices here).

Engine map (reference → TPU-native design):
    RHO/RHT     radix.py      multi-pass radix partition + partition-local join
    RSM         radix.py      radix partition + per-partition sort-merge
    PSM/MWAY    sortmerge.py  full sort + propagation/band merge
    PHT*/NPO*   nopart.py     open-addressing table: scatter-min build,
                              windowed-gather probe (no latches — rounds)
    NPBC_st     nopart.py     bucket-chaining analog (same table, 1 "thread")
    CHT         cht.py        rank-compressed (concise) table: sorted-dense
                              array + binary-search rank probe
    NL/INL      nested.py     blocked all-pairs / sorted-index probe
    CRKJ*       crk.py        iterative 1-bit cracking rounds (query-driven)
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from aqp_tpu.config import JoinConfig
from aqp_tpu.relation import Relation, JoinResult
from aqp_tpu.utils.timing import Timings


JoinEngine = Callable[[Relation, Relation, JoinConfig], Tuple[JoinResult, Timings]]

JOIN_ALGORITHMS: Dict[str, JoinEngine] = {}


def register(name: str):
    def deco(fn):
        JOIN_ALGORITHMS[name] = fn
        return fn

    return deco


def run_join(
    relR: Relation,
    relS: Relation,
    algorithm: str = "RHO",
    config: Optional[JoinConfig] = None,
) -> Tuple[JoinResult, Timings]:
    """Dispatch a join by algorithm name (joins.cpp:56-78)."""
    if algorithm not in JOIN_ALGORITHMS:
        raise ValueError(
            f"Algorithm not found: {algorithm}. Known: {sorted(JOIN_ALGORITHMS)}"
        )
    cfg = config or JoinConfig()
    result, timings = JOIN_ALGORITHMS[algorithm](relR, relS, cfg)
    timings.rows_in = relR.num_tuples + relS.num_tuples
    if cfg.defer:
        # deferred serving mode: no host synchronization here — matches
        # stays a device scalar until finalize_join (bench.py-style
        # pipelined dispatch; the int() fetch below is a hard sync)
        timings.matches = -1
        return result, timings
    timings.matches = int(result.matches)
    return result, timings


def finalize_join(
    relR: Relation,
    relS: Relation,
    result: JoinResult,
    timings: Timings,
    algorithm: str = "RHO",
    config: Optional[JoinConfig] = None,
) -> Tuple[JoinResult, Timings]:
    """Validate a deferred join result (hard sync).  On the rare tier
    overflow, re-run the full escalation ladder synchronously — the
    deferred path trades one optimistic dispatch for the ladder's per-tier
    syncs, exactly like the reference serving one `run_join` call
    (joins.cpp:55-78) with its task queues absorbing imbalance inline."""
    cfg = (config or JoinConfig()).replace(defer=False)
    if result.overflow is not None and int(result.overflow) != 0:
        # a sampled residual-cap tier that overflowed would overflow again
        # on every later deferred call for this relation — demote it first
        from aqp_tpu.joins.skewtier import demote_resid

        demote_resid(relS.key)
        return run_join(relR, relS, algorithm, cfg)
    timings.matches = int(result.matches)
    return result, timings


# Engine registration side effects:
from aqp_tpu.joins import sortmerge as _sm  # noqa: E402,F401
from aqp_tpu.joins import radix as _rx  # noqa: E402,F401
from aqp_tpu.joins import nopart as _np  # noqa: E402,F401
from aqp_tpu.joins import cht as _cht  # noqa: E402,F401
from aqp_tpu.joins import nested as _nl  # noqa: E402,F401
from aqp_tpu.joins import crk as _crk  # noqa: E402,F401
