"""Bag-of-words place recognition as dense TPU matmuls.

Parity: reference ``loop_closure.py`` (BoWDatabase: MiniBatchKMeans vocab,
normalised word histograms, cosine ranking with deterministic tiebreak,
``detect_loop`` threshold 0.75, ``export_vocabulary``).

TPU redesign: binary descriptors are unpacked to 0/1 bit vectors; the
vocabulary is trained with **jitted Lloyd iterations** where the E-step
distance matrix ``|x|² + |c|² − 2x·c`` is one MXU matmul per iteration,
and the M-step is a ``segment_sum``. Histogram assignment and cosine
retrieval over the whole database are likewise single matmuls — place
recognition cost grows O(frames) with perfect batching instead of the
reference's per-frame sklearn calls.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mvslam_tpu.ops.brief import unpack_bits


@dataclass(frozen=True)
class BoWConfig:
    """Parity: ``loop_closure.py`` defaults (vocab 500, threshold 0.75,
    train once len(desc)·frames ≥ vocab·10, min temporal gap)."""

    vocab_size: int = 256
    kmeans_iterations: int = 15
    similarity_threshold: float = 0.75
    min_frame_gap: int = 30
    min_train_descriptors_factor: int = 10
    # > 0: keep histograms in a device-resident index
    # (``loopclosure.device_index.DeviceBoWIndex``, initial capacity =
    # this value, doubling when full) and rank queries with one MXU
    # matvec + in-program top-k instead of a host matvec. 0 = host
    # ranking (reference behavior).
    device_index_capacity: int = 0


@partial(jax.jit, static_argnames=("vocab_size", "iterations"))
def _lloyd(bits: jnp.ndarray, key, vocab_size: int, iterations: int) -> jnp.ndarray:
    """K-means over (N, 256) bit vectors; returns (vocab_size, 256) f32."""
    n = bits.shape[0]
    x = bits.astype(jnp.float32)
    # Deterministic distinct init via Gumbel top-k over all rows.
    g = jax.random.gumbel(key, (n,))
    _, init_idx = jax.lax.top_k(g, vocab_size)
    centroids = x[init_idx]

    x_sq = jnp.sum(x * x, axis=1)

    def step(centroids, _):
        c_sq = jnp.sum(centroids * centroids, axis=1)
        dots = jax.lax.dot_general(
            x.astype(jnp.bfloat16),
            centroids.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        d = x_sq[:, None] + c_sq[None, :] - 2.0 * dots
        assign = jnp.argmin(d, axis=1)
        sums = jax.ops.segment_sum(x, assign, num_segments=vocab_size)
        counts = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), assign, num_segments=vocab_size)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        # Empty clusters keep their previous centroid.
        new = jnp.where(counts[:, None] > 0.5, new, centroids)
        return new, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iterations)
    return centroids


def train_vocabulary(
    descriptors: np.ndarray, key, vocab_size: int = 256, iterations: int = 15
) -> np.ndarray:
    """Train a visual vocabulary from packed (N, 8) uint32 descriptors."""
    bits = unpack_bits(jnp.asarray(descriptors, dtype=jnp.uint32))
    n = bits.shape[0]
    if n < vocab_size:
        raise ValueError(f"need >= {vocab_size} descriptors, got {n}")
    return np.asarray(_lloyd(bits, key, vocab_size, iterations))


@jax.jit
def assign_histogram(bits: jnp.ndarray, valid: jnp.ndarray, vocabulary: jnp.ndarray) -> jnp.ndarray:
    """Normalised word histogram of one frame's descriptors (masked)."""
    x = bits.astype(jnp.float32)
    c_sq = jnp.sum(vocabulary * vocabulary, axis=1)
    x_sq = jnp.sum(x * x, axis=1)
    dots = jax.lax.dot_general(
        x.astype(jnp.bfloat16),
        vocabulary.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    d = x_sq[:, None] + c_sq[None, :] - 2.0 * dots
    assign = jnp.argmin(d, axis=1)
    w = valid.astype(jnp.float32)
    hist = jax.ops.segment_sum(w, assign, num_segments=vocabulary.shape[0])
    norm = jnp.linalg.norm(hist)
    return hist / jnp.where(norm < 1e-12, 1.0, norm)


def compute_bow_histogram(descriptors: np.ndarray, valid: np.ndarray, vocabulary: np.ndarray) -> np.ndarray:
    """Host-friendly histogram API (parity: ``persistent_map.py:82-96``)."""
    bits = unpack_bits(jnp.asarray(descriptors, dtype=jnp.uint32))
    return np.asarray(assign_histogram(bits, jnp.asarray(valid), jnp.asarray(vocabulary, jnp.float32)))


class BoWDatabase:
    """Online loop detection database.

    Parity: ``loop_closure.py:8-85`` — frames accumulate; the vocabulary is
    trained once enough descriptors were seen; similarity ranking is a
    cosine matmul against all stored histograms with a deterministic
    (score, -frame_id) tiebreak.
    """

    def __init__(self, config: Optional[BoWConfig] = None, key=None, mesh=None) -> None:
        self.config = config or BoWConfig()
        self._key = key if key is not None else jax.random.key(0)
        self.vocabulary: Optional[np.ndarray] = None
        self._pending: List[Tuple[int, np.ndarray, np.ndarray]] = []
        self.frame_ids: List[int] = []
        self.histograms: List[np.ndarray] = []
        self._mesh = mesh
        self._device_index = None
        if self.config.device_index_capacity > 0:
            from mvslam_tpu.loopclosure.device_index import DeviceBoWIndex

            self._device_index = DeviceBoWIndex(
                self.config.vocab_size, self.config.device_index_capacity, mesh=mesh
            )

    def _maybe_train(self) -> None:
        if self.vocabulary is not None:
            return
        total = sum(int(v.sum()) for _, _, v in self._pending)
        if total < self.config.vocab_size * self.config.min_train_descriptors_factor:
            return
        desc = np.concatenate(
            [d[v] for _, d, v in self._pending if v.any()], axis=0
        )
        self.vocabulary = train_vocabulary(
            desc, self._key, self.config.vocab_size, self.config.kmeans_iterations
        )
        for fid, d, v in self._pending:
            self._record(fid, compute_bow_histogram(d, v, self.vocabulary))
        self._pending.clear()

    def _record(self, frame_id: int, hist: np.ndarray) -> None:
        self.frame_ids.append(int(frame_id))
        self.histograms.append(hist)
        if self._device_index is not None:
            self._device_index.add(frame_id, hist)

    def add_frame(self, frame_id: int, descriptors: np.ndarray, valid: Optional[np.ndarray] = None) -> None:
        descriptors = np.asarray(descriptors, dtype=np.uint32)
        valid = (
            np.ones(len(descriptors), bool) if valid is None else np.asarray(valid, bool)
        )
        if self.vocabulary is None:
            self._pending.append((int(frame_id), descriptors, valid))
            self._maybe_train()
        else:
            self._record(frame_id, compute_bow_histogram(descriptors, valid, self.vocabulary))

    @property
    def is_trained(self) -> bool:
        return self.vocabulary is not None

    def rank(self, descriptors: np.ndarray, valid: Optional[np.ndarray] = None) -> List[Tuple[int, float]]:
        """(frame_id, cosine score) sorted by (-score, frame_id)."""
        if self.vocabulary is None or not self.histograms:
            return []
        valid = (
            np.ones(len(descriptors), bool) if valid is None else np.asarray(valid, bool)
        )
        hist = compute_bow_histogram(np.asarray(descriptors, np.uint32), valid, self.vocabulary)
        return self._rank_from_hist(hist)

    def _rank_from_hist(self, hist: np.ndarray) -> List[Tuple[int, float]]:
        if not self.histograms:
            return []
        if self._device_index is not None:
            # Device matvec (MXU); one (F,) fetch. Host path below computes
            # the same scores on the host memory bus.
            scores = self._device_index.scores(hist)
        else:
            scores = np.stack(self.histograms) @ hist
        order = sorted(range(len(scores)), key=lambda i: (-float(scores[i]), self.frame_ids[i]))
        return [(self.frame_ids[i], float(scores[i])) for i in order]

    def process_keyframe(
        self, frame_id: int, descriptors: np.ndarray, valid: Optional[np.ndarray] = None
    ) -> Optional[Tuple[int, float]]:
        """Query-then-add with ONE histogram computation.

        ``detect_loop`` followed by ``add_frame`` computes the same
        histogram twice — two device dispatch+fetch round trips per
        keyframe, which on a network-tunneled chip is the BoW stage's
        entire cost. This is the per-keyframe entry point the offline
        pipeline uses: histogram once, query (frame not yet in the
        database, so it cannot match itself), then record.
        """
        descriptors = np.asarray(descriptors, dtype=np.uint32)
        valid = (
            np.ones(len(descriptors), bool) if valid is None else np.asarray(valid, bool)
        )
        if self.vocabulary is None:
            self._pending.append((int(frame_id), descriptors, valid))
            self._maybe_train()
            return None
        hist = compute_bow_histogram(descriptors, valid, self.vocabulary)
        hit = self._detect_from_hist(frame_id, hist)
        self._record(frame_id, hist)
        return hit

    def detect_loop(self, frame_id: int, descriptors: np.ndarray, valid: Optional[np.ndarray] = None) -> Optional[Tuple[int, float]]:
        """Best candidate above threshold outside the temporal window.

        Parity: ``loop_closure.py:76-85``.
        """
        if self.vocabulary is None:
            return None
        valid_arr = (
            np.ones(len(descriptors), bool) if valid is None else np.asarray(valid, bool)
        )
        hist = compute_bow_histogram(
            np.asarray(descriptors, np.uint32), valid_arr, self.vocabulary
        )
        return self._detect_from_hist(frame_id, hist)

    def _detect_from_hist(self, frame_id: int, hist: np.ndarray) -> Optional[Tuple[int, float]]:
        if self._device_index is not None and len(self.frame_ids) > 0:
            # Fast path: in-program top-k — only 2k scalars leave the
            # device. Falls back to the full ranking when every fetched
            # candidate is temporally excluded but more frames exist.
            k = min(16, len(self.frame_ids))
            top = self._device_index.topk(hist, k=k)
            for cand_id, score in top:
                if abs(frame_id - cand_id) < self.config.min_frame_gap:
                    continue
                if score >= self.config.similarity_threshold:
                    return cand_id, score
                return None  # ranked: first eligible is the best
            if k >= len(self.frame_ids):
                return None  # exhausted the whole database
            # else: all top-k temporally excluded — fall through to full rank
        for cand_id, score in self._rank_from_hist(hist):
            if abs(frame_id - cand_id) < self.config.min_frame_gap:
                continue
            if score >= self.config.similarity_threshold:
                return cand_id, score
            break  # ranked: first eligible is the best
        return None

    def export_vocabulary(self) -> Optional[np.ndarray]:
        """Parity: ``loop_closure.py:51-54``."""
        return None if self.vocabulary is None else self.vocabulary.copy()
