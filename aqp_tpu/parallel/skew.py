"""Skew-aware distributed join: heavy-hitter detection + broadcast join.

The reference absorbs skew with dynamic task-queue stealing of oversized
partitions (radix_join.cpp:1086-1335) and MWAY's heavy-hitter constants
(joincommon.h:25-29).  Dynamic stealing has no SPMD analog; the TPU-native
strategy is structural:

  1. detect globally-heavy probe keys (exact local run-lengths on a sorted
     shard + cross-shard candidate exchange — no sampling error for the
     Zipf workloads, z=1.5 concentrates >40% of rows in a handful of keys);
  2. route heavy-key build rows by REPLICATION (all_gather) instead of
     hashing, and leave heavy-key probe rows LOCAL (no shuffle — the whole
     point is that hashing them would overload one shard);
  3. shuffle only the light rows with the normal hash all_to_all.

Each (r, s) match is counted exactly once: heavy S rows exist on exactly
one shard, heavy R rows are replicated everywhere; light pairs meet on the
hash-owner shard.  Counts/checksums reduce with psum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from aqp_tpu.ops import mergejoin
from aqp_tpu.parallel.shuffle import PAD_R, PAD_S, shuffle_relation


def _local_topk_runs(key, k: int, pad_key):
    """Top-k (count, key) runs of the local shard (exact, sort-based)."""
    sk = jnp.sort(key)
    n = sk.shape[0]
    start = jnp.concatenate(
        [jnp.ones((1,), bool), sk[1:] != sk[:-1]]
    )
    idx = jnp.arange(n, dtype=jnp.int32)
    run_id = jnp.cumsum(start.astype(jnp.int32)) - 1
    # run length via segment ends: position of next start
    starts_pos = jnp.where(start, idx, n)
    # length of run r = next_start - start; compute per element then take
    # at run starts: next start after i
    # simpler: counts per run = bincount of run_id (dense, <= n runs)
    counts = jnp.zeros((n,), jnp.int32).at[run_id].add(1)
    run_keys = jnp.where(start, sk, pad_key)
    run_counts = jnp.where(start, counts[run_id], 0)
    run_counts = jnp.where(run_keys == pad_key, 0, run_counts)
    top_counts, top_idx = jax.lax.top_k(run_counts, k)
    return run_keys[top_idx], top_counts


def detect_heavy_keys(s_key, axis: str, k: int, threshold: int, pad_key=PAD_S):
    """Inside shard_map: global set of up to n*k candidate heavy keys with
    global count > threshold.  Returns a sorted (n*k,) key array padded
    with pad_key (replicated on every shard)."""
    n = jax.lax.axis_size(axis)
    cand_k, _ = _local_topk_runs(s_key, k, pad_key)
    all_cand = jax.lax.all_gather(cand_k, axis).reshape(-1)  # (n*k,)
    # global exact count of each candidate on this shard, then psum
    sk = jnp.sort(s_key)
    lo = jnp.searchsorted(sk, all_cand, side="left")
    hi = jnp.searchsorted(sk, all_cand, side="right")
    local_cnt = (hi - lo).astype(jnp.int32)
    glob = jax.lax.psum(local_cnt, axis)
    heavy = (glob > threshold) & (all_cand != pad_key)
    # dedup (candidates can repeat across shards) and KEEP SORTED: mask the
    # duplicates to a sentinel, then re-sort so searchsorted membership
    # tests stay valid (pad_key is negative and would otherwise intersperse)
    out = jnp.where(heavy, all_cand, pad_key)
    so = jnp.sort(out)
    dup = jnp.concatenate([jnp.zeros((1,), bool), so[1:] == so[:-1]])
    return jnp.sort(jnp.where(dup, pad_key, so))


def _split_by_membership(key, payload, heavy_sorted, pad_key, capacity: int):
    """(heavy rows compacted to capacity, light rows with heavy slots
    replaced by pad_key)."""
    pos = jnp.searchsorted(heavy_sorted, key)
    pos = jnp.clip(pos, 0, heavy_sorted.shape[0] - 1)
    is_heavy = (heavy_sorted[pos] == key) & (key != pad_key)
    m32 = is_heavy.astype(jnp.int32)
    slot = jnp.cumsum(m32) - m32
    ovf = jnp.sum(jnp.where(is_heavy & (slot >= capacity), 1, 0),
                  dtype=jnp.int32)
    tgt = jnp.where(is_heavy & (slot < capacity), slot, capacity)
    hk = jnp.full((capacity + 1,), pad_key, key.dtype).at[tgt].set(
        key, unique_indices=True, mode="drop")[:-1]
    hp = jnp.zeros((capacity + 1,), payload.dtype).at[tgt].set(
        payload, unique_indices=True, mode="drop")[:-1]
    lk = jnp.where(is_heavy, pad_key, key)
    lp = jnp.where(is_heavy, 0, payload)
    return hk, hp, lk, lp, ovf


def dist_join_count_skew_body(rk, rp, sk, sp, axis: str, cap_r: int,
                              cap_s: int, heavy_k: int = 16,
                              heavy_threshold: int = 0, cap_heavy: int = 1024):
    """shard_map body: skew-aware distributed count join.

    heavy_threshold <= 0 derives a default: 4x the expected per-key rows.
    """
    n = jax.lax.axis_size(axis)
    if heavy_threshold <= 0:
        heavy_threshold = max(64, 4 * (sk.shape[0] * n) // max(1, rk.shape[0] * n))
    heavy = detect_heavy_keys(sk, axis, heavy_k, heavy_threshold, PAD_S)
    # S: heavy rows stay local; R: heavy rows replicate everywhere
    hs_k, hs_p, ls_k, ls_p, ovf_hs = _split_by_membership(
        sk, sp, heavy, PAD_S, cap_heavy
    )
    hr_k, hr_p, lr_k, lr_p, ovf_hr = _split_by_membership(
        rk, rp, heavy, PAD_R, cap_heavy
    )
    hr_all_k = jax.lax.all_gather(hr_k, axis).reshape(-1)
    hr_all_p = jax.lax.all_gather(hr_p, axis).reshape(-1)
    # pad keys must never match: R pad=-1, S pad=-2 (mergejoin tags R<S)
    heavy_local = mergejoin.merge_join_count_general(
        hr_all_k, hr_all_p, hs_k, hs_p
    )
    rk2, rp2, ovf_r = shuffle_relation(lr_k, lr_p, axis, cap_r, PAD_R)
    sk2, sp2, ovf_s = shuffle_relation(ls_k, ls_p, axis, cap_s, PAD_S)
    light_local = mergejoin.merge_join_count(rk2, rp2, sk2, sp2)
    matches = jax.lax.psum(
        light_local.matches + heavy_local.matches, axis
    )
    checksum = jax.lax.psum(
        light_local.checksum + heavy_local.checksum, axis
    )
    overflow = ovf_r + ovf_s + jax.lax.psum(ovf_hs + ovf_hr, axis)
    return matches, checksum, overflow


def make_dist_join_count_skew(mesh, nr_shard: int, ns_shard: int,
                              axis: str = "shard", safety: float = 2.0,
                              heavy_k: int = 32, cap_heavy: int = 4096,
                              heavy_threshold: int = 0):
    """Jitted SPMD skew-aware distributed join (cf. make_dist_join_count).

    The default heavy threshold is tied to the light-path bucket capacity:
    any key whose global multiplicity could overflow a destination bucket
    by itself must be classified heavy."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    n = mesh.shape[axis]
    cap_r = max(8, int(nr_shard / n * safety))
    cap_s = max(8, int(ns_shard / n * safety))
    if heavy_threshold <= 0:
        heavy_threshold = max(32, cap_s // 8)
    body = functools.partial(
        dist_join_count_skew_body, axis=axis, cap_r=cap_r, cap_s=cap_s,
        heavy_k=heavy_k, cap_heavy=cap_heavy,
        heavy_threshold=heavy_threshold,
    )
    sharded = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
    )
    return jax.jit(sharded)
