"""Pallas scan kernels vs XLA scan ops (interpret mode, CPU)."""

import jax.numpy as jnp
import numpy as np

from aqp_tpu.ops import scan as xscan
from aqp_tpu.ops.pallas import scan as pscan

N = pscan.LANES * 256 * 2  # two blocks at sub=256


def _col():
    return (jnp.arange(N, dtype=jnp.int32) * 37 % 251).astype(jnp.uint8)


def test_count_sum():
    col = _col()
    lo, hi = jnp.uint8(30), jnp.uint8(200)
    assert int(pscan.scan_count_pallas(col, lo, hi, sub=256, interpret=True)) == int(
        xscan.scan_count(col, lo, hi)
    )
    assert int(pscan.scan_sum_pallas(col, lo, hi, sub=256, interpret=True)) == int(
        xscan.scan_sum(col, lo, hi)
    )


def test_bitvector():
    col = _col()
    lo, hi = jnp.uint8(10), jnp.uint8(99)
    got = np.asarray(pscan.scan_bitvector_pallas(col, lo, hi, sub=256, interpret=True))
    exp = np.asarray(xscan.scan_bitvector(col, lo, hi))
    assert got.shape == exp.shape
    assert (got == exp).all()


def test_index_scan():
    col = _col()
    lo, hi = jnp.uint8(30), jnp.uint8(200)
    cap = N // 128  # generous
    ids, cnt, ovf = pscan.scan_index_pallas(col, lo, hi, cap, interpret=True)
    assert int(ovf) == 0
    c = np.asarray(col)
    want = np.nonzero((c >= 30) & (c <= 200))[0]
    assert int(cnt) == want.size
    got = np.asarray(ids)
    got = np.sort(got[got < (1 << 30) - 2])
    np.testing.assert_array_equal(got, want)


def test_values_scan():
    col = _col()
    lo, hi = jnp.uint8(0), jnp.uint8(99)  # includes value 0: filler trap
    cap = N // 128
    ids, vals, cnt, ovf = pscan.scan_values_pallas(col, lo, hi, cap,
                                                   interpret=True)
    assert int(ovf) == 0
    c = np.asarray(col).astype(np.int64)
    sel = (c >= 0) & (c <= 99)
    assert int(cnt) == int(sel.sum())
    live = np.asarray(ids) < (1 << 30) - 2
    got = np.sort(np.asarray(vals)[live])
    np.testing.assert_array_equal(got, np.sort(c[sel]))


def test_dict_scan():
    col = _col()
    lo, hi = jnp.uint8(50), jnp.uint8(60)
    dict_lo = jnp.arange(256, dtype=jnp.int32) * 3 + 7
    dict_hi = jnp.arange(256, dtype=jnp.int32) * 11 + 1
    cap = N // 128
    ids, glo, ghi, cnt, ovf = pscan.scan_dict_pallas(
        col, dict_lo, dict_hi, lo, hi, cap, interpret=True)
    assert int(ovf) == 0
    c = np.asarray(col).astype(np.int64)
    sel = (c >= 50) & (c <= 60)
    assert int(cnt) == int(sel.sum())
    live = np.asarray(ids) < (1 << 30) - 2
    got = np.stack([np.asarray(glo)[live], np.asarray(ghi)[live]], 1)
    want = np.stack([c[sel] * 3 + 7, c[sel] * 11 + 1], 1)
    np.testing.assert_array_equal(
        got[np.lexsort(got.T)], want[np.lexsort(want.T)])


def test_index_scan_overflow_reported():
    col = _col()
    ids, cnt, ovf = pscan.scan_index_pallas(
        col, jnp.uint8(0), jnp.uint8(255), 8, interpret=True)
    assert int(ovf) > 0
