"""Lane-compaction kernel vs numpy oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from aqp_tpu.ops.pallas.lanecompact import (
    compact_kp_fast,
    scan_index_fast,
    scan_values_fast,
)
from aqp_tpu.ops.pallas.compact import PAD_R_INPUT, PAD_S_INPUT


def _valid(ids):
    a = np.asarray(ids)
    return a[a < PAD_R_INPUT]


@pytest.mark.parametrize("n,sel", [(1 << 14, 0.1), (1 << 14, 0.97),
                                   (3 * (1 << 13) + 17, 0.5),
                                   (1 << 15, 0.0), (1 << 14, 1.0)])
def test_scan_index_fast_oracle(n, sel):
    rng = np.random.default_rng(42)
    col = rng.integers(0, 256, n).astype(np.uint8)
    hi = int(round(sel * 256)) - 1
    ids, cnt, ovf = scan_index_fast(
        jnp.asarray(col), 0, hi, cap_rows=-(-n // 128) + 2, w=64,
        interpret=True)
    want = np.nonzero(col <= hi)[0] if hi >= 0 else np.array([], np.int64)
    assert int(ovf) == 0
    assert int(cnt) == want.size
    got = _valid(ids)
    np.testing.assert_array_equal(got, want)


def test_scan_values_fast_oracle():
    rng = np.random.default_rng(7)
    n = 1 << 14
    col = rng.integers(0, 256, n).astype(np.uint8)
    ids, vals, cnt, ovf = scan_values_fast(
        jnp.asarray(col), 32, 200, cap_rows=-(-n // 128) + 2, w=64,
        interpret=True)
    m = (col >= 32) & (col <= 200)
    want_ids = np.nonzero(m)[0]
    assert int(ovf) == 0 and int(cnt) == want_ids.size
    ids_np = np.asarray(ids)
    keep = ids_np < PAD_R_INPUT
    np.testing.assert_array_equal(ids_np[keep], want_ids)
    np.testing.assert_array_equal(np.asarray(vals)[keep], col[want_ids])


def test_compact_kp_fast_oracle():
    rng = np.random.default_rng(3)
    n = 1 << 14
    key = rng.integers(0, 1 << 20, n).astype(np.int32)
    pay = rng.integers(0, 1 << 20, n).astype(np.int32)
    drop = rng.random(n) < 0.6
    key[drop] = PAD_S_INPUT
    ok, op, ovf = compact_kp_fast(
        jnp.asarray(key), jnp.asarray(pay), cap_rows=-(-n // 128) + 2,
        w=64, interpret=True)
    assert int(ovf) == 0
    keep = np.asarray(ok) < PAD_R_INPUT
    np.testing.assert_array_equal(np.asarray(ok)[keep], key[~drop])
    np.testing.assert_array_equal(np.asarray(op)[keep], pay[~drop])


def test_scan_index_fast_overflow_reported():
    col = np.zeros(1 << 13, np.uint8)  # everything qualifies
    ids, cnt, ovf = scan_index_fast(
        jnp.asarray(col), 0, 255, cap_rows=8, w=64, interpret=True)
    assert int(ovf) > 0


def test_compact_kp_fast_non_divisible():
    """Input not a multiple of the window: internal pad elements must not
    leak into the output as valid rows."""
    rng = np.random.default_rng(9)
    n = (1 << 13) + 777
    key = rng.integers(0, 1 << 20, n).astype(np.int32)
    pay = rng.integers(0, 1 << 20, n).astype(np.int32)
    drop = rng.random(n) < 0.3
    key[drop] = PAD_S_INPUT
    ok, op, ovf = compact_kp_fast(
        jnp.asarray(key), jnp.asarray(pay), cap_rows=-(-n // 128) + 2,
        w=64, interpret=True)
    assert int(ovf) == 0
    keep = np.asarray(ok) < PAD_R_INPUT
    np.testing.assert_array_equal(np.asarray(ok)[keep], key[~drop])
    np.testing.assert_array_equal(np.asarray(op)[keep], pay[~drop])


def test_sel_hint_scaled_windows_exact_and_reported():
    """sel_hint-scaled output windows: a correct hint is exact; a hint
    far below the real selectivity reports overflow (never silent)."""
    rng = np.random.default_rng(9)
    n = 1 << 14
    col = rng.integers(0, 256, n).astype(np.uint8)
    hi = 63  # ~25% selectivity
    ids, cnt, ovf = scan_index_fast(
        jnp.asarray(col), 0, hi, cap_rows=-(-n // 128) + 2, w=64,
        sel_hint=0.25, interpret=True)
    want = np.nonzero(col <= hi)[0]
    assert int(ovf) == 0
    assert int(cnt) == want.size
    np.testing.assert_array_equal(_valid(ids), want)
    # hint far too low -> overflow reported
    _, _, ovf2 = scan_index_fast(
        jnp.asarray(col), 0, 200, cap_rows=-(-n // 128) + 2, w=64,
        sel_hint=0.05, interpret=True)
    assert int(ovf2) > 0


def test_compact_k_fast_keys_only():
    from aqp_tpu.ops.pallas.lanecompact import compact_k_fast

    rng = np.random.default_rng(11)
    n = 1 << 14
    key = rng.integers(0, 1000, n).astype(np.int32)
    key[rng.random(n) < 0.7] = PAD_S_INPUT  # ~30% keep
    cap = -(-n // 128) + 2
    out, ovf = compact_k_fast(jnp.asarray(key), cap, w=64, keep_frac=0.3,
                              interpret=True)
    want = key[key < PAD_R_INPUT]
    assert int(ovf) == 0
    np.testing.assert_array_equal(_valid(out), want)
