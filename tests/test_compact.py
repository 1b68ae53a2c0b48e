"""Pallas row-granular compaction correctness (interpret mode, CPU).

Validates ops/pallas/compact.py (the bounded-buffer compaction behind the
fused TPC-H plans and the write-producing scan modes) against a NumPy
oracle: all valid elements present exactly once, pads only at block
boundaries, overflow reported when capacity is short.
"""

import numpy as np
import jax.numpy as jnp

from aqp_tpu.ops.pallas.compact import (
    PAD_R_INPUT,
    PAD_S_INPUT,
    compact_kp,
)


def _mk(n, sel, seed):
    rng = np.random.default_rng(seed)
    key = rng.integers(1, 1 << 20, n).astype(np.int32)
    pay = rng.integers(0, 1 << 20, n).astype(np.int32)
    keep = rng.random(n) < sel
    mkey = np.where(keep, key, PAD_S_INPUT).astype(np.int32)
    mpay = np.where(keep, pay, 0).astype(np.int32)
    return mkey, mpay, key[keep], pay[keep]


def test_compact_preserves_valid_multiset():
    n = 128 * 256  # two sub=128 blocks
    mkey, mpay, vk, vp = _mk(n, 0.3, 5)
    cap_rows = (int(vk.size) // 128 + 4)
    ok, op, ovf = compact_kp(jnp.asarray(mkey), jnp.asarray(mpay),
                             cap_rows, sub=128, interpret=True)
    assert int(ovf) == 0
    ok = np.asarray(ok)
    op = np.asarray(op)
    live = ok < PAD_R_INPUT
    assert live.sum() == vk.size
    got = sorted(zip(ok[live].tolist(), op[live].tolist()))
    want = sorted(zip(vk.tolist(), vp.tolist()))
    assert got == want


def test_compact_overflow_detected():
    n = 128 * 256
    mkey, mpay, vk, _ = _mk(n, 0.9, 6)
    cap_rows = max(1, int(vk.size) // 128 // 2)  # too small
    _, _, ovf = compact_kp(jnp.asarray(mkey), jnp.asarray(mpay),
                           cap_rows, sub=128, interpret=True)
    assert int(ovf) > 0


def test_compact_all_pads():
    n = 128 * 128
    mkey = jnp.full((n,), PAD_R_INPUT, jnp.int32)
    mpay = jnp.zeros((n,), jnp.int32)
    ok, _, ovf = compact_kp(mkey, mpay, 4, sub=128, interpret=True)
    assert int(ovf) == 0
    assert int(jnp.sum((ok < PAD_R_INPUT).astype(jnp.int32))) == 0
