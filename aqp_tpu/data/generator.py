"""Deterministic relation generators with the reference's oracle semantics.

Replicates the *distributional* contract of the reference generators
(Join-Benchmarks/lib/AppUtilities/src/generator.cpp) so the closed-form
cardinality oracles carry over exactly:

- `create_relation_pk` (generator.cpp:351-376): keys are exactly the dense
  set {1..n}, randomly permuted (Knuth shuffle there; jax.random.permutation
  here).  Payloads zero.
- `create_relation_fk` (generator.cpp:472-512): floor(n/maxid) complete
  copies of {1..maxid}, each independently shuffled, plus a shuffled-prefix
  remainder block ⇒ joining against the PK relation yields exactly n matches.
- `create_relation_fk_sel`: FK keys drawn from an enlarged domain
  {1..maxid}, maxid = 100*|R|/sel, so expected matches = sel% * n
  (App/TEEBench/App.cpp:150-153).
- `create_relation_zipf` (generator.cpp:638-660, genzipf.cpp:34-94): keys
  Zipf(z)-distributed over a *shuffled* alphabet {1..alphabet_size} via
  CDF lookup-table inversion.

All generators are seeded and reproducible.  Generation runs on-device
(jitted) — the Knuth-shuffle loop of the reference is replaced by
`jax.random.permutation`, which has the same "uniform random permutation"
contract without a sequential loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aqp_tpu.relation import Relation


def _key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


@functools.partial(jax.jit, static_argnames=("num_tuples", "dtype"))
def _pk_keys(seed_arr, num_tuples: int, dtype):
    perm = jax.random.permutation(seed_arr, num_tuples)
    return (perm + 1).astype(dtype)


def create_relation_pk(num_tuples: int, seed: int = 11111, dtype=jnp.int32) -> Relation:
    """Dense unique primary keys {1..n}, shuffled.  generator.cpp:351-376."""
    keys = _pk_keys(_key(seed), num_tuples, dtype)
    return Relation.from_keys(keys)


@functools.partial(jax.jit, static_argnames=("num_tuples", "maxid", "dtype"))
def _fk_keys(seed_arr, num_tuples: int, maxid: int, dtype):
    # Tile the dense set {1..maxid}; shuffle each full block independently and
    # the remainder block as a shuffled prefix (generator.cpp:472-512 shuffles
    # each iters-block in place; the remainder keeps values {1..rem} — it is
    # built from a freshly shuffled dense block's prefix, which the reference
    # approximates by shuffling the tail range in place).
    full_blocks = num_tuples // maxid
    rem = num_tuples - full_blocks * maxid
    seeds = jax.random.split(seed_arr, full_blocks + 1)
    parts = []
    for b in range(full_blocks):
        parts.append(jax.random.permutation(seeds[b], maxid) + 1)
    if rem:
        # Shuffled prefix of a dense block: a uniform random rem-subset in
        # uniform random order — take the first `rem` entries of a permutation.
        parts.append((jax.random.permutation(seeds[-1], maxid) + 1)[:rem])
    keys = jnp.concatenate(parts) if parts else jnp.zeros((0,), dtype)
    return keys.astype(dtype)


def create_relation_fk(
    num_tuples: int, maxid: int, seed: int = 22222, dtype=jnp.int32
) -> Relation:
    """Tiled foreign keys over {1..maxid} ⇒ exactly num_tuples matches when
    joined with the maxid-row PK relation.  generator.cpp:472-512."""
    keys = _fk_keys(_key(seed), num_tuples, maxid, dtype)
    return Relation.from_keys(keys)


def create_relation_fk_sel(
    num_tuples: int, r_tuples: int, selectivity: float, seed: int = 22222, dtype=jnp.int32
) -> Relation:
    """FK relation with join selectivity `selectivity` ∈ (0,100].

    The reference widens the key domain to maxid = 100*|R|/sel
    (App.cpp:150-153) so each probe key matches with probability sel%.
    Materializing that domain's permutation at sel=1% would need several
    HBM-sized buffers (1.3e9 keys at the headline |R|) and would exceed
    the engines' 2^30 key domain, so the same quantity is generated
    directly: each key is a MATCHING draw from {1..|R|} with probability
    sel/100, else a non-matching draw from (|R|, 2^30-8) — identical
    match semantics, bounded domain, O(n) memory."""
    maxid = int(round(100.0 * r_tuples / selectivity))
    if maxid <= 4 * num_tuples and maxid < (1 << 30) - 8:
        keys = _fk_keys(_key(seed), num_tuples, maxid, dtype)
        return Relation.from_keys(keys)
    k1, k2, k3 = jax.random.split(_key(seed), 3)
    match = jax.random.uniform(k1, (num_tuples,)) < (selectivity / 100.0)
    hit = jax.random.randint(k2, (num_tuples,), 1, r_tuples + 1, jnp.int32)
    miss = jax.random.randint(k3, (num_tuples,), r_tuples + 1,
                              (1 << 30) - 8, jnp.int32)
    return Relation.from_keys(jnp.where(match, hit, miss).astype(dtype))


def _zipf_cdf_lut(alphabet_size: int, zipf_factor: float) -> np.ndarray:
    """Normalized Zipf CDF over ranks 1..alphabet_size (genzipf.cpp:56-74)."""
    ranks = np.arange(1, alphabet_size + 1, dtype=np.float64)
    weights = ranks ** (-zipf_factor)
    cdf = np.cumsum(weights)
    return cdf / cdf[-1]


def create_relation_zipf(
    num_tuples: int,
    alphabet_size: int,
    zipf_factor: float,
    seed: int = 22222,
    dtype=jnp.int32,
) -> Relation:
    """Zipf(z)-skewed FK keys over a shuffled alphabet {1..alphabet_size}.

    genzipf.cpp draws u~U(0,1) and binary-searches the CDF LUT; the alphabet
    is itself shuffled (gen_alphabet, genzipf.cpp:34-48) so the heavy hitters
    are random key values, not small ones.
    """
    cdf = jnp.asarray(_zipf_cdf_lut(alphabet_size, zipf_factor), dtype=jnp.float32)
    k_alpha, k_draw = jax.random.split(_key(seed))
    alphabet = jax.random.permutation(k_alpha, alphabet_size) + 1

    @jax.jit
    def draw(cdf, alphabet):
        u = jax.random.uniform(k_draw, (num_tuples,), dtype=jnp.float32)
        ranks = jnp.searchsorted(cdf, u, side="left",
                                  method="sort")
        ranks = jnp.clip(ranks, 0, alphabet_size - 1)
        return alphabet[ranks].astype(dtype)

    return Relation.from_keys(draw(cdf, alphabet))


def oracle_matches_fk(num_s_tuples: int) -> int:
    """FK workload oracle: every S tuple matches exactly once
    (SURVEY.md §4.2; generator.cpp:143-152,472-500)."""
    return num_s_tuples
