"""Packed-Hamming descriptor matching on the MXU.

Replaces the reference's cv2 BFMatcher (Hamming, cross-check / Lowe
ratio — ``feature_pipeline.py.bak:78-95``) and its pure-NumPy popcount
matcher (``homography.py:9-26``).

Key idea: with descriptors unpacked to a 0/1 bit matrix ``B``,
``hamming(i, j) = |b_i| + |b_j| − 2·b_i·b_j`` — so the full N×M distance
matrix is **one matmul** (N,256)x(256,M) that runs on the systolic array,
plus rank-1 corrections. bf16 multiplicands are exact for 0/1 values with
f32 accumulation, so this path requests low precision explicitly.

All outputs are fixed-shape with validity masks: `match_descriptors`
returns per-query best/second-best, and `select_matches` compacts the
mutually-consistent survivors into a padded (K, 2) index-pair table
ordered by ascending distance (the reference's sorted, capped match list).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mvslam_tpu.ops.brief import unpack_bits

_BIG = jnp.float32(1e9)


@dataclass(frozen=True)
class MatchConfig:
    ratio: float = 0.8
    cross_check: bool = True
    use_ratio_test: bool = False  # reference default: cross-check on, ratio off
    max_distance: float = 256.0


def hamming_distance_matrix(
    desc1: jnp.ndarray, desc2: jnp.ndarray
) -> jnp.ndarray:
    """(N, 8) x (M, 8) packed uint32 → (N, M) float32 Hamming distances."""
    b1 = unpack_bits(desc1).astype(jnp.bfloat16)
    b2 = unpack_bits(desc2).astype(jnp.bfloat16)
    s1 = jnp.sum(b1, axis=1, dtype=jnp.float32)
    s2 = jnp.sum(b2, axis=1, dtype=jnp.float32)
    dot = jax.lax.dot_general(
        b1,
        b2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return s1[:, None] + s2[None, :] - 2.0 * dot


class MatchResult(NamedTuple):
    indices: jnp.ndarray  # (N,) best index into desc2 per query
    distances: jnp.ndarray  # (N,) best distance
    second_distances: jnp.ndarray  # (N,) runner-up distance
    valid: jnp.ndarray  # (N,) bool — survived masks + cross-check + ratio


@partial(jax.jit, static_argnames=("config",))
def match_descriptors(
    desc1: jnp.ndarray,
    valid1: jnp.ndarray,
    desc2: jnp.ndarray,
    valid2: jnp.ndarray,
    config: MatchConfig = MatchConfig(),
) -> MatchResult:
    """Brute-force Hamming matching with cross-check and/or Lowe ratio."""
    d = hamming_distance_matrix(desc1, desc2)
    d = jnp.where(valid2[None, :], d, _BIG)
    d = jnp.where(valid1[:, None], d, _BIG)

    # Best + runner-up via two min/argmin passes — plain VPU reductions,
    # much cheaper on TPU than lax.top_k over the full N x M matrix.
    best_idx = jnp.argmin(d, axis=1)
    best = jnp.take_along_axis(d, best_idx[:, None], axis=1)[:, 0]
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d_masked = jnp.where(cols == best_idx[:, None], _BIG, d)
    second = jnp.min(d_masked, axis=1)

    ok = valid1 & (best < config.max_distance) & (best < _BIG * 0.5)
    if config.use_ratio_test:
        ok = ok & (best < config.ratio * second)
    if config.cross_check:
        col_best = jnp.argmin(d, axis=0)  # (M,) best query per train
        mutual = col_best[best_idx] == jnp.arange(d.shape[0])
        ok = ok & mutual
    return MatchResult(best_idx, best, second, ok)


def match_descriptors_host(
    desc1,
    valid1,
    desc2,
    valid2,
    config: MatchConfig = MatchConfig(),
) -> MatchResult:
    """Host (C++) brute-force matcher: bitwise-identical to
    :func:`match_descriptors`, ~10x faster than XLA:CPU on one core.

    Used by the small-solve host path (``core/hostdispatch.py``): a
    host-placed pair gate / loop-geometry solve spends ~79 ms of its
    ~82 ms in the N x M distance+argmin stage on XLA:CPU, while the
    native AVX popcount matcher (``native/src/mvslam_native.cc``,
    ``mvn_hamming_match``) does it in ~8 ms with integer-exact outputs
    (parity asserted in tests/test_native.py). Falls back to the jitted
    matcher when the native library is unavailable. Returns numpy-backed
    arrays; downstream jitted stages accept them as uncommitted inputs.
    """
    import numpy as np

    from mvslam_tpu import native as _native

    d1 = np.asarray(desc1, np.uint32)
    d2 = np.asarray(desc2, np.uint32)
    v1 = np.asarray(valid1, bool)
    v2 = np.asarray(valid2, bool)
    out = _native.hamming_match(d1, v1, d2, v2) if _native.native_available() else None
    if out is None:
        return match_descriptors(d1, v1, d2, v2, config)
    best_idx, best, second, col_best = out
    ok = v1 & (best < config.max_distance) & (best < float(_BIG) * 0.5)
    if config.use_ratio_test:
        ok = ok & (best < config.ratio * second)
    if config.cross_check:
        ok = ok & (col_best[best_idx] == np.arange(d1.shape[0]))
    return MatchResult(best_idx, best, second, ok)


class SelectedMatches(NamedTuple):
    pairs: jnp.ndarray  # (K, 2) int32 (query_idx, train_idx)
    distances: jnp.ndarray  # (K,)
    valid: jnp.ndarray  # (K,) bool
    num_valid: jnp.ndarray  # () int32


@partial(jax.jit, static_argnames=("max_matches",))
def select_matches(result: MatchResult, max_matches: int = 512) -> SelectedMatches:
    """Compact per-query matches to the best ``max_matches`` by distance.

    Equivalent to the reference's distance-sorted, capped match list
    (``feature_pipeline.py.bak:78-95``), but shape-static.
    """
    masked = jnp.where(result.valid, result.distances, _BIG)
    k = min(max_matches, masked.shape[0])
    neg_d, rows = jax.lax.top_k(-masked, k)
    dist = -neg_d
    valid = dist < _BIG * 0.5
    pairs = jnp.stack([rows, result.indices[rows]], axis=-1).astype(jnp.int32)
    pairs = jnp.where(valid[:, None], pairs, 0)
    if k < max_matches:
        pad = max_matches - k
        pairs = jnp.pad(pairs, ((0, pad), (0, 0)))
        dist = jnp.pad(dist, (0, pad), constant_values=float(_BIG))
        valid = jnp.pad(valid, (0, pad))
    return SelectedMatches(pairs, jnp.where(valid, dist, 0.0), valid, jnp.sum(valid))


def gather_matched_points(
    xy1: jnp.ndarray, xy2: jnp.ndarray, selected: SelectedMatches
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(K, 2) matched pixel coordinates in each frame (masked slots → 0).

    Parity: ``matches_to_points`` (feature_pipeline.py.bak:104-112).
    """
    p1 = xy1[selected.pairs[:, 0]]
    p2 = xy2[selected.pairs[:, 1]]
    m = selected.valid[:, None]
    return jnp.where(m, p1, 0.0), jnp.where(m, p2, 0.0)
