"""Hash shuffle: the distributed radix-partition pass.

The reference's analog is the shared-memory exchange plan: per-thread
histograms + global prefix sums give each thread disjoint scatter ranges
(radix_join.cpp:886-931).  Across chips there is no shared memory, so the
exchange is explicit: each shard buckets its rows by destination
(`partition_hash` of the key over the axis size), packs them into
fixed-capacity per-destination send buffers (XLA collectives need static
shapes — the capacity plays the reference's padding role,
prj_params.h:94), and `all_to_all` routes them over ICI/DCN.

Rows are (key, payload) pairs; unused buffer slots carry sentinel keys that
can never match (PAD_R = -1 for build side, PAD_S = -2 for probe side).
An overflow counter reports rows dropped when a destination bucket exceeds
capacity — callers size capacity with a safety factor and re-shuffle with a
salted hash if overflow occurs (skew escape hatch; see parallel/skew.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aqp_tpu.ops.hashing import partition_hash

PAD_R = np.int32(-1)
PAD_S = np.int32(-2)


def _pack_send_buffers(key, payload, n_dest: int, capacity: int, pad_key,
                       salt: int):
    """Bucket local rows by hash destination into a (n_dest, capacity)
    buffer (destination computation + delegate to _pack_by_dest)."""
    bits = max(1, (n_dest - 1).bit_length())
    dest = partition_hash(key, bits, salt=salt) % n_dest
    return _pack_by_dest(key, payload, dest, n_dest, capacity, pad_key)


def shuffle_relation(key, payload, axis: str, capacity: int, pad_key, salt: int = 0):
    """Inside shard_map: route rows to the shard owning hash(key).

    Returns (key[n*capacity], payload[n*capacity], overflow) — the rows now
    resident on this shard (padded with pad_key).
    """
    n = jax.lax.axis_size(axis)
    bk, bp, ovf = _pack_send_buffers(key, payload, n, capacity, pad_key, salt)
    rk = jax.lax.all_to_all(bk, axis, split_axis=0, concat_axis=0, tiled=False)
    rp = jax.lax.all_to_all(bp, axis, split_axis=0, concat_axis=0, tiled=False)
    ovf_total = jax.lax.psum(ovf, axis)
    return rk.reshape(-1), rp.reshape(-1), ovf_total


def _pack_by_dest(key, payload, dest, n_dest: int, capacity: int, pad_key):
    """Pack rows into per-destination send buffers given a destination per
    row.  Local reorder is a stable sort by destination (the fast reorder
    primitive on this hardware); slot indices inside each destination come
    from the position minus the destination's start offset (histogram
    prefix — the reference's exchange-plan idiom, radix_join.cpp:886-931).

    ALL negative keys are dropped, not just this side's pad: every sentinel
    in the system is negative (PAD_R -1, PAD_S -2, chunked-output holes -3,
    shard_relation padding) and no generator/TPC-H key is — so a padded row
    from the other side can never phantom-match a receive-buffer pad slot.
    """
    dest = jnp.where((key == pad_key) | (key < 0), n_dest, dest)
    d, k, p = jax.lax.sort((dest, key, payload), num_keys=1, is_stable=True)
    n = k.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    hist = jnp.sum(
        (d[:, None] == jnp.arange(n_dest + 1)[None, :]).astype(jnp.int32),
        axis=0)
    starts = jnp.cumsum(hist) - hist
    slot = pos - starts[jnp.clip(d, 0, n_dest)]
    in_cap = (slot < capacity) & (d < n_dest)
    overflow = jnp.sum((slot >= capacity) & (d < n_dest), dtype=jnp.int32)
    flat_idx = jnp.where(in_cap, d * capacity + slot, n_dest * capacity)
    buf_k = jnp.full((n_dest * capacity + 1,), pad_key, k.dtype).at[
        flat_idx].set(k, unique_indices=True, mode="drop")[:-1]
    buf_p = jnp.zeros((n_dest * capacity + 1,), p.dtype).at[flat_idx].set(
        p, unique_indices=True, mode="drop")[:-1]
    return (buf_k.reshape(n_dest, capacity), buf_p.reshape(n_dest, capacity),
            overflow)


def shuffle_relation_hier(key, payload, host_axis: str, chip_axis: str,
                          cap_host: int, cap_chip: int, pad_key,
                          salt: int = 0):
    """Two-level hierarchical shuffle over a (host × chip) mesh.

    The multi-pass composition of SURVEY.md §2c row 8: pass 1 routes rows to
    the owning HOST over the DCN axis (destination = high part of the hash
    bucket), pass 2 routes within the host to the owning CHIP over ICI.
    This is the cluster analog of the reference's 2-pass radix partition
    (radix_join.cpp:319-329): coarse fanout first so the expensive (DCN)
    exchange moves each row once, fine fanout on the faster interconnect.

    Final owner of a key = mesh position (dest // nc, dest % nc) where
    dest = partition_hash(key) % (nh*nc) — identical key→owner mapping for
    every sender, so all copies of a key meet.  Returns (key, payload,
    overflow_total); overflow counts rows dropped at either level (psum'd).
    """
    nh = jax.lax.axis_size(host_axis)
    nc = jax.lax.axis_size(chip_axis)
    bits = max(1, (nh * nc - 1).bit_length())
    dest = partition_hash(key, bits, salt=salt) % (nh * nc)
    # level 1: to the destination host (DCN)
    bk, bp, ovf1 = _pack_by_dest(key, payload, dest // nc, nh, cap_host,
                                 pad_key)
    k1 = jax.lax.all_to_all(bk, host_axis, 0, 0, tiled=False).reshape(-1)
    p1 = jax.lax.all_to_all(bp, host_axis, 0, 0, tiled=False).reshape(-1)
    # level 2: within the host, to the destination chip (ICI)
    dest2 = partition_hash(k1, bits, salt=salt) % (nh * nc) % nc
    bk2, bp2, ovf2 = _pack_by_dest(k1, p1, dest2, nc, cap_chip, pad_key)
    k2 = jax.lax.all_to_all(bk2, chip_axis, 0, 0, tiled=False).reshape(-1)
    p2 = jax.lax.all_to_all(bp2, chip_axis, 0, 0, tiled=False).reshape(-1)
    ovf = jax.lax.psum(jax.lax.psum(ovf1 + ovf2, host_axis), chip_axis)
    return k2, p2, ovf
