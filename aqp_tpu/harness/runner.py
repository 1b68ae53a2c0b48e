"""Experiment driver: config matrices → long-format CSV rows.

Reference: SGXv2Scripts/scripts/helpers/runner.py + commons.py — a Python
harness that (re)builds per flag-set, runs binaries over a config matrix,
regex-parses stdout phase lines, and appends long-format CSV rows
(`mode,flags,alg,threads,size_r,size_s,...,measurement,value`).

TPU design: no rebuild-per-flag (JoinConfig knobs are jit-static args) and
no stdout scraping (Timings objects are structured).  The CSV schema keeps
the reference's long format so the committed plotting recipes carry over:

    backend,alg,materialize,size_r,size_s,skew,selectivity,rep,measurement,value

Measurements emitted per run: every phase key (seconds), `matches`,
`throughput_mrows` — the same grep-able quantities the reference prints
(print_timing radix_join.cpp:218-250).
"""

from __future__ import annotations

import dataclasses
import itertools
import sys
import time
from typing import Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp

from aqp_tpu.config import JoinConfig
from aqp_tpu.data import (
    create_relation_fk,
    create_relation_fk_sel,
    create_relation_pk,
    create_relation_zipf,
)
from aqp_tpu.joins.api import finalize_join, run_join
from aqp_tpu.utils.logging import get_logger
from aqp_tpu.utils.timing import hard_sync

log = get_logger("harness")

CSV_HEADER = (
    "backend,alg,materialize,size_r,size_s,skew,selectivity,rep,measurement,value"
)


@dataclasses.dataclass
class ExperimentConfig:
    """Cartesian experiment matrix (ExperimentConfig analog,
    runner.py:152-169)."""

    algorithms: Sequence[str] = ("RHO",)
    sizes: Sequence[tuple] = ((1 << 20, 1 << 22),)  # (|R|, |S|) pairs
    skews: Sequence[Optional[float]] = (None,)
    selectivities: Sequence[Optional[float]] = (None,)
    materialize: Sequence[bool] = (False,)
    reps: int = 3
    seed_r: int = 11111
    seed_s: int = 22222
    # run each (alg, workload, cfg) once unrecorded before rep 0 so compile
    # time never lands in the measured rows (the reference likewise plots
    # post-warmup repetitions, runner.py:204)
    warmup: bool = True
    # capture a jax.profiler trace per measured rep and emit a
    # `device_total_s` row (PerfEvent-counter analog; utils/profiler.py)
    profile_dir: Optional[str] = None
    # alias each relation's payload buffer to its key buffer — the
    # reference's generators leave payloads uninitialized
    # (generator.cpp writes keys only), and keys-only runs (checksum
    # False) never read them; halves HBM so the |R| sweep reaches the
    # reference's 524M-row top point on a 16 GB chip
    alias_payloads: bool = False
    # run the matrix with 8-byte keys (reference KEY_8B, data-types.h:6-12):
    # generators emit int64 relations and every engine takes the XLA core
    # (the packed-key Pallas network is int32-only); requires
    # jax.config.update("jax_enable_x64", True) before workload generation
    key64: bool = False
    # serve the reference-equivalent count configuration: the reference's
    # count branch accumulates MATCHES ONLY and never reads payloads
    # (radix_join.cpp:428-447), so baseline-comparable runs disable the
    # payload checksum; oracle tests keep checksum=True via run_join's
    # library default.
    checksum: bool = False

    def enumerate(self):
        return itertools.product(
            self.algorithms, self.sizes, self.skews, self.selectivities,
            self.materialize, range(self.reps),
        )


def _gen_workload(size_r, size_s, skew, selectivity, seed_r, seed_s,
                  alias_payloads=False, key64=False):
    dtype = jnp.int64 if key64 else jnp.int32
    relR = create_relation_pk(size_r, seed=seed_r, dtype=dtype)
    if skew is not None:
        relS = create_relation_zipf(size_s, size_r, skew, seed=seed_s)
    elif selectivity is not None:
        relS = create_relation_fk_sel(size_s, size_r, selectivity, seed=seed_s)
    else:
        relS = create_relation_fk(size_s, size_r, seed=seed_s, dtype=dtype)
    if key64 and relS.key.dtype != jnp.int64:
        from aqp_tpu.relation import Relation

        relS = Relation(relS.key.astype(jnp.int64),
                        relS.payload.astype(jnp.int64))
    if alias_payloads:
        from aqp_tpu.relation import Relation

        relR = Relation(relR.key, relR.key)
        relS = Relation(relS.key, relS.key)
    jax.block_until_ready((relR.key, relS.key))
    return relR, relS


def run_experiments(cfg: ExperimentConfig, backend: str = "tpu") -> List[Dict]:
    """Run the matrix; returns a list of long-format row dicts."""
    rows: List[Dict] = []
    cache = {}
    warmed = set()
    for alg, (nr, ns), skew, sel, mat, rep in cfg.enumerate():
        wkey = (nr, ns, skew, sel)
        if wkey not in cache:
            cache.clear()  # keep at most one workload resident (HBM budget)
            cache[wkey] = _gen_workload(nr, ns, skew, sel, cfg.seed_r,
                                        cfg.seed_s, cfg.alias_payloads,
                                        cfg.key64)
        relR, relS = cache[wkey]
        jc = JoinConfig(materialize=mat, checksum=cfg.checksum,
                        key64=cfg.key64)
        try:
            if cfg.warmup and (alg, wkey, mat) not in warmed:
                run_join(relR, relS, alg, jc)  # compile run, unrecorded
                warmed.add((alg, wkey, mat))
            if cfg.profile_dir:
                import os

                from aqp_tpu.utils import profiler

                sub = os.path.join(cfg.profile_dir,
                                   f"{alg}_{nr}x{ns}_r{rep}")
                with profiler.trace(sub):
                    result, t = run_join(relR, relS, alg, jc)
                prep = profiler.parse_trace(sub)
            else:
                prep = None
                result, t = run_join(relR, relS, alg, jc)
        except Exception as e:  # record failures like runner.py:236-244
            log.error(f"{alg} {nr}x{ns} failed: {e}")
            rows.append(_row(backend, alg, mat, nr, ns, skew, sel, rep, "error", 1.0))
            continue
        base = dict(
            backend=backend, alg=alg, materialize=int(mat), size_r=nr,
            size_s=ns, skew=skew if skew is not None else 0.0,
            selectivity=sel if sel is not None else 100.0, rep=rep,
        )
        for phase, secs in t.phases.items():
            rows.append({**base, "measurement": f"phase_{phase}_s", "value": secs})
        rows.append({**base, "measurement": "matches", "value": float(t.matches)})
        rows.append({**base, "measurement": "throughput_mrows", "value": t.mrows_per_s})
        if prep is not None:
            rows.append({**base, "measurement": "device_total_s",
                         "value": prep.device_total_s})
        log.info(
            f"{alg} {nr}x{ns} skew={skew} sel={sel} mat={mat} rep={rep}: "
            f"{t.mrows_per_s:.1f} M rows/s, {t.matches} matches"
        )
    return rows


_PIPE_WARM = False


def run_experiments_pipelined(cfg: ExperimentConfig,
                              backend: str = "tpu") -> List[Dict]:
    """Async-pipelined variant of run_experiments (bench.py methodology —
    the reference times back-to-back in-process calls too; this platform's
    25-40 ms dispatch floor otherwise lands in every per-call number).

    Per configuration: one deferred warmup call is VALIDATED through
    finalize_join (compiles + checks the tier's overflow), then `reps`
    deferred calls are issued back-to-back with a single hard sync at the
    end; the last result is validated again.  Emits the same long-format
    rows (phase_join_s = mean seconds/call)."""
    rows: List[Dict] = []
    cache = {}
    for alg, (nr, ns), skew, sel, mat in itertools.product(
            cfg.algorithms, cfg.sizes, cfg.skews, cfg.selectivities,
            cfg.materialize):
        wkey = (nr, ns, skew, sel)
        if wkey not in cache:
            cache.clear()
            cache[wkey] = _gen_workload(nr, ns, skew, sel, cfg.seed_r,
                                        cfg.seed_s, cfg.alias_payloads,
                                        cfg.key64)
        relR, relS = cache[wkey]
        jc = JoinConfig(materialize=mat, checksum=cfg.checksum, defer=True,
                        key64=cfg.key64)
        try:
            res, t = run_join(relR, relS, alg, jc)  # compile, unrecorded
            res, t = finalize_join(relR, relS, res, t, alg, jc)
            matches = t.matches
            global _PIPE_WARM
            if not _PIPE_WARM:
                # the first timed loop in a fresh process otherwise runs
                # ~8x slow (tunnel/runtime ramp-up, not the kernel — the
                # identical config re-measures at full speed immediately
                # after; r5 session logs), poisoning exactly one CSV row
                for _ in range(2):
                    res, _t2 = run_join(relR, relS, alg, jc)
                hard_sync(res.matches)
                _PIPE_WARM = True
            t0 = time.perf_counter()
            for _ in range(cfg.reps):
                res, _ = run_join(relR, relS, alg, jc)
            hard_sync(res.matches)
            dt = (time.perf_counter() - t0) / cfg.reps
            if res.overflow is not None and int(res.overflow) != 0:
                # the pipelined tier overflowed mid-loop: the timing is
                # not a valid serving number — record the synchronous
                # escalated path instead (never a silently-wrong row)
                log.error(f"{alg} {nr}x{ns}: deferred tier overflowed; "
                          "recording synchronous escalation timing")
                sync_cfg = jc.replace(defer=False)
                t1 = time.perf_counter()
                res2, t2 = run_join(relR, relS, alg, sync_cfg)
                dt = time.perf_counter() - t1
                matches = t2.matches
        except Exception as e:  # record failures like runner.py:236-244
            log.error(f"{alg} {nr}x{ns} failed: {e}")
            rows.append(_row(backend, alg, mat, nr, ns, skew, sel, 0,
                             "error", 1.0))
            continue
        for rep in range(cfg.reps):
            base = dict(
                backend=backend, alg=alg, materialize=int(mat), size_r=nr,
                size_s=ns, skew=skew if skew is not None else 0.0,
                selectivity=sel if sel is not None else 100.0, rep=rep,
            )
            rows.append({**base, "measurement": "phase_join_s", "value": dt})
            rows.append({**base, "measurement": "phase_total_s", "value": dt})
            rows.append({**base, "measurement": "matches",
                         "value": float(matches)})
            rows.append({**base, "measurement": "throughput_mrows",
                         "value": (nr + ns) / dt / 1e6})
        log.info(f"{alg} {nr}x{ns} skew={skew} sel={sel} mat={mat} "
                 f"pipelined: {(nr + ns) / dt / 1e6:.1f} M rows/s, "
                 f"{matches} matches")
    return rows


def _row(backend, alg, mat, nr, ns, skew, sel, rep, measurement, value):
    return dict(
        backend=backend, alg=alg, materialize=int(mat), size_r=nr, size_s=ns,
        skew=skew if skew is not None else 0.0,
        selectivity=sel if sel is not None else 100.0, rep=rep,
        measurement=measurement, value=value,
    )


def rows_to_csv(rows: Iterable[Dict], path: str, append: bool = False) -> None:
    mode = "a" if append else "w"
    with open(path, mode) as f:
        if not append:
            f.write(CSV_HEADER + "\n")
        for r in rows:
            f.write(
                f"{r['backend']},{r['alg']},{r['materialize']},{r['size_r']},"
                f"{r['size_s']},{r['skew']},{r['selectivity']},{r['rep']},"
                f"{r['measurement']},{r['value']}\n"
            )
