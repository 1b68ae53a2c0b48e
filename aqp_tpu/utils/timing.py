"""Phase timing and the stable metric contract.

The reference threads 13 named rdtscp phase timers through every algorithm
and prints them in a fixed grep-able format that the Python harness
regex-parses (radix_join.cpp:94-108, print_timing radix_join.cpp:218-250,
SGXv2Scripts/scripts/helpers/runner.py:14-55).  The TPU equivalent: wall
timers around blocking jitted segments, a canonical set of phase keys, and a
printer that emits both the grep-able lines and one JSON object per run.

Canonical phase keys (superset across algorithms):
    total, partition, partition_pass1, partition_pass2, build, probe, join,
    sort, merge, filter, materialize, shuffle
Throughput contract matches the reference: M input-rows/s =
(|R|+|S|) / total_seconds / 1e6 (radix_join.cpp:195-198).
"""

from __future__ import annotations

import json
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax

def hard_sync(x):
    """Force device completion: block_until_ready + a 1-element host fetch.

    On the tunneled axon platform `block_until_ready` alone has been
    observed not to block (bench.py methodology note); fetching one element
    to the host is the reliable barrier.  Returns x unchanged.
    """
    jax.block_until_ready(x)
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            leaf.ravel()[0].item()
            break
    return x


def ensure_platform_from_env():
    """Honor JAX_PLATFORMS=cpu even where sitecustomize pre-registers the
    TPU plugin and overrides the env (used by experiment drivers so the
    same script runs on CPU for correctness and on TPU for numbers)."""
    import os

    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)
    # Pallas bitonic blocks at sub>=1024 need the scoped-VMEM raise; it must
    # be in the env before the first TPU compile.  Centralized here so every
    # experiment driver gets it, not just __main__/bench.py.
    os.environ.setdefault(
        "LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=100000")
    # Persistent compile cache for experiment drivers.  Deliberately a
    # DIFFERENT dir from bench.py's committed .jax_cache: bench entries
    # ship with the repo to keep driver bench runs fast, while experiment
    # compiles (many engine geometries) stay local-only (.gitignore) so
    # they don't bloat history (ADVICE.md r3).
    cache = os.environ.get("AQP_CACHE_DIR", "/root/repo/.jax_cache_exp")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


PHASE_KEYS = (
    "total",
    "partition",
    "partition_pass1",
    "partition_pass2",
    "build",
    "probe",
    "join",
    "sort",
    "merge",
    "filter",
    "materialize",
    "shuffle",
)


@dataclass
class Timings:
    """Seconds per phase + derived throughput."""

    phases: Dict[str, float] = field(default_factory=dict)
    rows_in: int = 0
    matches: int = 0

    @property
    def total(self) -> float:
        return self.phases.get("total", sum(self.phases.values()))

    @property
    def mrows_per_s(self) -> float:
        t = self.total
        return (self.rows_in / t / 1e6) if t > 0 else float("inf")

    def print_contract(self) -> None:
        """Grep-able fixed-format lines (analog of print_timing,
        radix_join.cpp:218-250)."""
        for k in PHASE_KEYS:
            if k in self.phases:
                print(f"{k.replace('_', ' ').title()} Time (s): {self.phases[k]:.6f}")
        print(f"Result tuples: {self.matches}")
        print(f"Throughput (M rec/sec): {self.mrows_per_s:.4f}")

    def json_line(self, **extra) -> str:
        d = dict(
            phases=self.phases,
            rows_in=self.rows_in,
            matches=self.matches,
            mrows_per_s=self.mrows_per_s,
        )
        d.update(extra)
        return json.dumps(d)


class PhaseTimer:
    """Wall-clock phase timer around blocking device work.

    Unlike the reference's per-thread rdtscp timers aggregated as
    max-over-threads (radix_join.cpp:1580-1610), SPMD phases are globally
    synchronous: we time around `block_until_ready` boundaries.
    """

    def __init__(self) -> None:
        self.t = Timings()

    @contextmanager
    def phase(self, name: str, result=None):
        t0 = time.perf_counter()
        out = {}
        try:
            yield out
        finally:
            if "result" in out:
                hard_sync(out["result"])
            self.t.phases[name] = self.t.phases.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def time_fn(self, name: str, fn, *args, **kw):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        hard_sync(out)
        self.t.phases[name] = self.t.phases.get(name, 0.0) + (time.perf_counter() - t0)
        return out

    def submit_fn(self, name: str, fn, *args, **kw):
        """Non-blocking variant for the deferred serving mode
        (JoinConfig.defer): records submission time only — the caller's
        pipelined loop measures the real device time end-to-end."""
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        self.t.phases[name] = self.t.phases.get(name, 0.0) + (
            time.perf_counter() - t0)
        return out
