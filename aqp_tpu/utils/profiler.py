"""Device profiler layer — the PerfEvent analog.

The reference wraps hot sections in perf_event_open HW counters (cycles,
instructions, L1D/LLC misses, IPC) and prints a counter block per benchmark
(lib/PerfEvent/include/PerfEvent.hpp:45-80, exposed to the enclave through
ocall_start/stop_performance_counters, lib/OCalls/src/ocalls.cpp:18-32).
On TPU the equivalents are:

  * `trace(logdir)` — capture a `jax.profiler` trace (xplane + trace-viewer
    JSON) around a section; the artifact opens in xprof/tensorboard.
  * `parse_trace(logdir)` — extract DEVICE time from the captured trace:
    per-program execution times on the TPU plane and the busy-interval
    union (the "cycles" analog — wall time measured by the device itself,
    free of host dispatch latency).
  * `counters(fn, *args)` — compiled-program cost analysis (FLOPs, HBM
    bytes accessed) plus derived GFLOP/s, GB/s, and roofline utilization
    against the chip peaks (the "instructions/IPC" analog).

CLI: every `python -m aqp_tpu` subcommand takes `--profile DIR` which
wraps the measured section in `trace()` and merges `parse_trace()`'s
device seconds into the printed JSON/CSV metrics.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import time
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax

# TPU v5e (v5 lite) single-chip peaks: 394 TFLOP/s bf16 / 197 int8 TOPS;
# HBM ~819 GB/s.  Used only for utilization ratios in counter reports.
PEAK_HBM_GBS = 819.0
PEAK_BF16_TFLOPS = 394.0


@dataclass
class TraceReport:
    """Device-side timing extracted from a jax.profiler trace."""

    device_total_s: float = 0.0          # union of busy intervals, TPU plane
    host_total_s: float = 0.0            # union of busy intervals, host plane
    per_program_s: Dict[str, float] = field(default_factory=dict)
    per_program_calls: Dict[str, int] = field(default_factory=dict)
    trace_path: Optional[str] = None

    def to_dict(self) -> dict:
        return {
            "device_total_s": round(self.device_total_s, 6),
            "host_total_s": round(self.host_total_s, 6),
            "per_program_s": {k: round(v, 6)
                              for k, v in sorted(self.per_program_s.items())},
            "per_program_calls": dict(sorted(self.per_program_calls.items())),
            "trace_path": self.trace_path,
        }


@contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace into `logdir` (xprof-compatible)."""
    with jax.profiler.trace(logdir):
        yield


def _interval_union(iv: List[tuple]) -> float:
    if not iv:
        return 0.0
    iv.sort()
    total = 0.0
    cur_s, cur_e = iv[0]
    for s, e in iv[1:]:
        if s > cur_e:
            total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    return total + (cur_e - cur_s)


def parse_trace(logdir: str) -> TraceReport:
    """Extract device/host busy time from the newest trace under `logdir`.

    Reads the trace-viewer JSON (written alongside the xplane proto).
    Device program times are the top-level `jit_*` module executions on the
    TPU process; busy time is the union of all event intervals per process
    (nested fusion events can overlap their parent, so plain sums would
    double-count).
    """
    paths = sorted(glob.glob(
        os.path.join(logdir, "plugins/profile/*/*.trace.json.gz")))
    rep = TraceReport()
    if not paths:
        return rep
    path = paths[-1]
    rep.trace_path = path
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    proc_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_name[e["pid"]] = e.get("args", {}).get("name", "")
    dev_iv: List[tuple] = []
    host_iv: List[tuple] = []
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = proc_name.get(e.get("pid"), "")
        ts = float(e.get("ts", 0.0)) * 1e-6
        dur = float(e.get("dur", 0.0)) * 1e-6
        if pname.startswith("/device:"):
            dev_iv.append((ts, ts + dur))
            name = e.get("name", "")
            if name.startswith("jit"):
                base = name.split("(")[0]
                rep.per_program_s[base] = rep.per_program_s.get(base, 0.0) + dur
                rep.per_program_calls[base] = (
                    rep.per_program_calls.get(base, 0) + 1)
        elif pname.startswith("/host:"):
            host_iv.append((ts, ts + dur))
    rep.device_total_s = _interval_union(dev_iv)
    rep.host_total_s = _interval_union(host_iv)
    return rep


def profile_fn(fn: Callable, *args, logdir: str = "/tmp/aqp_profile",
               reps: int = 1):
    """Run `fn(*args)` `reps` times under a device trace; return
    (last_result, TraceReport)."""
    out = fn(*args)  # warm outside the trace (compile/load excluded)
    jax.block_until_ready(out)
    with trace(logdir):
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
    return out, parse_trace(logdir)


def counters(fn: Callable, *args, seconds: Optional[float] = None) -> dict:
    """PerfEvent-style counter block for a jittable `fn` at `args`.

    FLOPs and HBM bytes come from the compiled program's own cost analysis
    (the instruction-count analog); with a measured `seconds`, derived
    GFLOP/s, GB/s, and HBM roofline utilization are added (the IPC analog).
    """
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0) or 0.0)
    byt = float(ca.get("bytes accessed", 0.0) or 0.0)
    out = {"flops": flops, "bytes_accessed": byt}
    if seconds and seconds > 0:
        out["gflops_per_s"] = round(flops / seconds / 1e9, 2)
        out["gb_per_s"] = round(byt / seconds / 1e9, 2)
        out["hbm_utilization"] = round(byt / seconds / 1e9 / PEAK_HBM_GBS, 4)
        out["seconds"] = seconds
    return out
