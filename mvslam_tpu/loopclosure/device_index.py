"""Device-resident BoW histogram index for place recognition at map scale.

The reference scores loop-closure candidates on the host — a Python loop
over stored histograms (``loop_closure.py:60-75``) or a NumPy matvec over
a snapshot (``persistent_map.py:197-240``). At serving scale (tens of
thousands of keyframes queried every frame) that puts an O(F·V) read on
the host memory bus per query and the whole database in host RAM.

TPU redesign: the histogram matrix lives in HBM as a **static-capacity**
buffer — queries are one (F, V)·(V,) matvec on the MXU and one in-program
``top_k``, so only (k) candidate ids/scores travel device→host. Row
inserts are donated ``dynamic_update_slice`` programs whose output
sharding equals the buffer sharding, so on a mesh an insert updates one
row of one shard (GSPMD partitions the dynamic-update-slice with no
collectives — verified in ``tests/parallel_checks.py``). When the buffer
fills, capacity doubles (one zero-alloc + slice-copy program, O(log n)
recompiles over a run) instead of failing mid-sequence. With a mesh, the
capacity axis is sharded across chips — each chip scores its map shard
and the top-k combine rides ICI — so map capacity scales linearly with
the chip count (the persistent-map analog of the sharded RANSAC/solver
paths in ``parallel/mesh.py``).

Frame ids must be inserted in strictly increasing order (enforced). That
makes ``lax.top_k``'s lowest-index tie-break identical to the host
ranking's ``(-score, frame_id)`` order — including for ties that straddle
the k cutoff — so device and host loop detection can never disagree.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


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
        self._mesh = mesh
        self._sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._sharding = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            if capacity % mesh.size:
                capacity += mesh.size - capacity % mesh.size
        self.capacity = int(capacity)
        buf = jnp.zeros((self.capacity, self.vocab_size), jnp.float32)
        if self._sharding is not None:
            buf = jax.device_put(buf, self._sharding)
        self._buf = buf
        self.frame_ids: List[int] = []
        # Sharding-preserving donated insert: output sharding pinned to the
        # buffer sharding so a mesh insert never reshuffles the buffer.
        self._insert = jax.jit(
            lambda b, r, i: jax.lax.dynamic_update_slice(b, r[None, :], (i, 0)),
            donate_argnums=(0,),
            out_shardings=self._sharding,
        )
        self._grow_copy = jax.jit(
            lambda new, old: jax.lax.dynamic_update_slice(new, old, (0, 0)),
            donate_argnums=(0,),
            out_shardings=self._sharding,
        )

    def __len__(self) -> int:
        return len(self.frame_ids)

    def grow(self, new_capacity: int) -> None:
        """Reallocate to ``new_capacity`` rows (device-side slice copy)."""
        if self._sharding is not None and new_capacity % self._mesh.size:
            new_capacity += self._mesh.size - new_capacity % self._mesh.size
        if new_capacity <= self.capacity:
            return
        new = jnp.zeros((int(new_capacity), self.vocab_size), jnp.float32)
        if self._sharding is not None:
            new = jax.device_put(new, self._sharding)
        self._buf = self._grow_copy(new, self._buf)
        logger.info(
            "device BoW index grown", extra={"from": self.capacity, "to": int(new_capacity)}
        )
        self.capacity = int(new_capacity)

    def add(self, frame_id: int, histogram: np.ndarray) -> None:
        """Insert one L2-normalised histogram row (donated in-place update).

        Grows the buffer (doubling) when full instead of failing — a long
        sequence must never crash mid-run on index capacity. Frame ids
        must be strictly increasing (keeps device/host tie-breaks equal).
        """
        frame_id = int(frame_id)
        if self.frame_ids and frame_id <= self.frame_ids[-1]:
            raise ValueError(
                f"frame ids must be strictly increasing (got {frame_id} after "
                f"{self.frame_ids[-1]}); monotone insertion is what makes the "
                "device top-k tie-break match the host (-score, frame_id) order"
            )
        if len(self.frame_ids) >= self.capacity:
            self.grow(self.capacity * 2)
        row = jnp.asarray(histogram, jnp.float32)
        self._buf = self._insert(
            self._buf, row, jnp.asarray(len(self.frame_ids), jnp.int32)
        )
        self.frame_ids.append(frame_id)

    def topk(self, histogram: np.ndarray, k: int = 5) -> List[Tuple[int, float]]:
        """Best-k (frame_id, cosine score), ties broken by lower frame id.

        One device program: matvec + masked ``top_k``; only 2·k scalars
        are fetched. Exactness: rows are inserted in frame-id order, so
        ``lax.top_k``'s lowest-index tie-break IS the host's
        ``(-score, frame_id)`` order, even for ties across the cutoff.
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
        """Bulk-load a snapshot's histogram matrix (one H2D transfer).

        ``frame_ids`` must be strictly increasing (see class docstring).
        """
        ids = [int(f) for f in frame_ids]
        if any(b <= a for a, b in zip(ids, ids[1:])):
            raise ValueError(
                "frame_ids must be strictly increasing for the device index "
                "(sort the snapshot by frame id before bulk-loading)"
            )
        histograms = np.asarray(histograms, np.float32)
        n, vocab = histograms.shape
        cap = int(capacity) if capacity is not None else max(n, 1)
        if mesh is not None and cap % mesh.size:
            cap += mesh.size - cap % mesh.size
        if cap < n:
            raise ValueError(f"capacity {cap} < {n} histograms")
        index = cls(vocab, cap, mesh=mesh)
        padded = np.zeros((index.capacity, vocab), np.float32)
        padded[:n] = histograms
        buf = jnp.asarray(padded)
        if index._sharding is not None:
            buf = jax.device_put(buf, index._sharding)
        index._buf = buf
        index.frame_ids = ids
        return index
