"""Device-resident BoW histogram index for place recognition at map scale.

The reference scores loop-closure candidates on the host — a Python loop
over stored histograms (``loop_closure.py:60-75``) or a NumPy matvec over
a snapshot (``persistent_map.py:197-240``). At serving scale (tens of
thousands of keyframes queried every frame) that puts an O(F·V) read on
the host memory bus per query and the whole database in host RAM.

TPU redesign: the histogram matrix lives in HBM as a **static-capacity**
buffer — queries are one (F, V)·(V,) matvec on the MXU and one in-program
``top_k``, so only (k) candidate ids/scores travel device→host. Row
inserts are donated ``dynamic_update_slice`` programs (no reallocation,
no recompilation: capacity is fixed at construction). With a mesh, the
capacity axis is sharded across chips — each chip scores its map shard
and the top-k combine rides ICI — so map capacity scales linearly with
the chip count (the persistent-map analog of the sharded RANSAC/solver
paths in ``parallel/mesh.py``).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, donate_argnums=(0,))
def _insert_row(buf: jnp.ndarray, row: jnp.ndarray, i: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.dynamic_update_slice(buf, row[None, :], (i, 0))


@partial(jax.jit, static_argnames=("k",))
def _topk_scores(buf: jnp.ndarray, hist: jnp.ndarray, count: jnp.ndarray, k: int):
    scores = buf @ hist  # (capacity,) — MXU matvec
    # Mask unfilled rows to -inf so they never rank.
    idx = jnp.arange(buf.shape[0])
    scores = jnp.where(idx < count, scores, -jnp.inf)
    return jax.lax.top_k(scores, k)


class DeviceBoWIndex:
    """Static-capacity, device-resident cosine index over BoW histograms.

    Rows must be L2-normalised histograms (``assign_histogram`` output);
    cosine similarity is then the plain dot product.

    ``mesh``: optional 1-D :class:`jax.sharding.Mesh` — shards the
    capacity axis across its devices (capacity must divide by mesh size).
    Scoring runs the same jaxpr as the unsharded index; only the buffer
    sharding differs, so results match to float tolerance.
    """

    def __init__(self, vocab_size: int, capacity: int, mesh=None) -> None:
        if capacity <= 0:
            raise ValueError("capacity must be positive")
        self.vocab_size = int(vocab_size)
        self.capacity = int(capacity)
        self._sharding = None
        if mesh is not None:
            if capacity % mesh.size:
                raise ValueError(
                    f"capacity ({capacity}) must divide by mesh size {mesh.size}"
                )
            from jax.sharding import NamedSharding, PartitionSpec

            self._sharding = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        buf = jnp.zeros((self.capacity, self.vocab_size), jnp.float32)
        if self._sharding is not None:
            buf = jax.device_put(buf, self._sharding)
        self._buf = buf
        self.frame_ids: List[int] = []

    def __len__(self) -> int:
        return len(self.frame_ids)

    def add(self, frame_id: int, histogram: np.ndarray) -> None:
        """Insert one L2-normalised histogram row (donated in-place update)."""
        if len(self.frame_ids) >= self.capacity:
            raise ValueError(f"index full (capacity {self.capacity})")
        row = jnp.asarray(histogram, jnp.float32)
        buf = _insert_row(self._buf, row, jnp.asarray(len(self.frame_ids), jnp.int32))
        if self._sharding is not None:
            buf = jax.device_put(buf, self._sharding)
        self._buf = buf
        self.frame_ids.append(int(frame_id))

    def topk(self, histogram: np.ndarray, k: int = 5) -> List[Tuple[int, float]]:
        """Best-k (frame_id, cosine score), ties broken by lower frame id.

        One device program: matvec + masked ``top_k``; only 2·k scalars
        are fetched.
        """
        if not self.frame_ids:
            return []
        k_eff = min(int(k), self.capacity)
        scores, idx = _topk_scores(
            self._buf,
            jnp.asarray(histogram, jnp.float32),
            jnp.asarray(len(self.frame_ids), jnp.int32),
            k_eff,
        )
        scores = np.asarray(scores)
        idx = np.asarray(idx)
        out = [
            (self.frame_ids[int(i)], float(s))
            for s, i in zip(scores, idx)
            if np.isfinite(s)
        ][: len(self.frame_ids)]
        # lax.top_k breaks ties by lower index == insertion order == lower
        # frame id for monotone insertion; re-sort for the general case.
        out.sort(key=lambda t: (-t[1], t[0]))
        return out[:k]

    def scores(self, histogram: np.ndarray) -> np.ndarray:
        """Full (len(self),) score vector (for parity tests/diagnostics)."""
        if not self.frame_ids:
            return np.zeros(0, np.float32)
        s = self._buf @ jnp.asarray(histogram, jnp.float32)
        return np.asarray(s)[: len(self.frame_ids)]

    @classmethod
    def from_histograms(
        cls,
        frame_ids,
        histograms: np.ndarray,
        capacity: Optional[int] = None,
        mesh=None,
    ) -> "DeviceBoWIndex":
        """Bulk-load a snapshot's histogram matrix (one H2D transfer)."""
        histograms = np.asarray(histograms, np.float32)
        n, vocab = histograms.shape
        cap = int(capacity) if capacity is not None else max(n, 1)
        if mesh is not None and cap % mesh.size:
            cap += mesh.size - cap % mesh.size
        if cap < n:
            raise ValueError(f"capacity {cap} < {n} histograms")
        index = cls(vocab, cap, mesh=mesh)
        padded = np.zeros((cap, vocab), np.float32)
        padded[:n] = histograms
        buf = jnp.asarray(padded)
        if index._sharding is not None:
            buf = jax.device_put(buf, index._sharding)
        index._buf = buf
        index.frame_ids = [int(f) for f in frame_ids]
        return index
