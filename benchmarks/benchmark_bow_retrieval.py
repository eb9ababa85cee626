"""BoW place-recognition retrieval: host matvec vs device-resident index.

The reference ranks loop candidates on the host (``loop_closure.py:60-75``,
``persistent_map.py:197-240``). The TPU build can keep the histogram
matrix in HBM (``loopclosure.device_index.DeviceBoWIndex``) and score a
query with one MXU matvec + in-program top-k, fetching only k candidates.
This benchmark measures both paths over growing map sizes, plus the
incremental insert cost of the donated dynamic_update_slice path.

On a CPU host the two paths share silicon — the point there is validating
the contract; the device path's win appears on a real chip where the map
never crosses the PCIe/tunnel boundary per query.
"""

from __future__ import annotations

import time

import numpy as np

from benchmarks._harness import emit


def main(vocab: int = 256, queries: int = 50) -> None:
    from mvslam_tpu.loopclosure.device_index import DeviceBoWIndex

    rng = np.random.default_rng(0)
    for map_size in (1024, 8192):
        hists = rng.uniform(0, 1, size=(map_size, vocab)).astype(np.float32)
        hists /= np.linalg.norm(hists, axis=1, keepdims=True)
        qs = hists[rng.integers(0, map_size, queries)]

        # Host path: NumPy matvec + full sort (reference behavior).
        start = time.perf_counter()
        for q in qs:
            scores = hists @ q
            np.argsort(-scores)[:5]
        host_s = time.perf_counter() - start
        emit(
            f"bow_host_rank_{map_size}",
            queries / max(host_s, 1e-12),
            "queries/s",
            map_size=map_size,
            vocab=vocab,
        )

        index = DeviceBoWIndex.from_histograms(range(map_size), hists)
        index.topk(qs[0], k=5)  # warm/compile
        start = time.perf_counter()
        for q in qs:
            index.topk(q, k=5)
        dev_s = time.perf_counter() - start
        emit(
            f"bow_device_topk_{map_size}",
            queries / max(dev_s, 1e-12),
            "queries/s",
            map_size=map_size,
            vocab=vocab,
            vs_host=round(host_s / max(dev_s, 1e-12), 2),
        )

    # Incremental insert (donated in-place row update).
    index = DeviceBoWIndex(vocab, capacity=4096)
    h = rng.uniform(0, 1, size=(vocab,)).astype(np.float32)
    h /= np.linalg.norm(h)
    index.add(0, h)  # warm/compile
    start = time.perf_counter()
    for i in range(1, 1001):
        index.add(i, h)
    insert_s = time.perf_counter() - start
    emit("bow_device_insert", 1000 / max(insert_s, 1e-12), "inserts/s")


if __name__ == "__main__":
    main()
