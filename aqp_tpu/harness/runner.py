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

from aqp_tpu.config import JoinConfig
from aqp_tpu.data import (
    create_relation_fk,
    create_relation_fk_sel,
    create_relation_pk,
    create_relation_zipf,
)
from aqp_tpu.joins.api import run_join
from aqp_tpu.utils.logging import get_logger

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


def _gen_workload(size_r, size_s, skew, selectivity, seed_r, seed_s):
    relR = create_relation_pk(size_r, seed=seed_r)
    if skew is not None:
        relS = create_relation_zipf(size_s, size_r, skew, seed=seed_s)
    elif selectivity is not None:
        relS = create_relation_fk_sel(size_s, size_r, selectivity, seed=seed_s)
    else:
        relS = create_relation_fk(size_s, size_r, seed=seed_s)
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
            cache[wkey] = _gen_workload(nr, ns, skew, sel, cfg.seed_r, cfg.seed_s)
        relR, relS = cache[wkey]
        jc = JoinConfig(materialize=mat, checksum=cfg.checksum)
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
