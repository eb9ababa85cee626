"""Pyramidal LK flow throughput (TPU-build addition: ops/lk.py).

Measures steady-state tracking of N points across a KITTI-sized frame
pair (compile excluded, device-synchronised), following the repo's
benchmark measurement contract.
"""

import numpy as np

from benchmarks._harness import emit, measured


def main(num_points: int = 2048, repeats: int = 20):
    import jax
    import jax.numpy as jnp

    from mvslam_tpu.ops.lk import LKConfig, lk_track

    rng = np.random.default_rng(0)
    h, w = 370, 1226
    img = rng.uniform(0, 40, size=(h, w + 8)).astype(np.float32)
    for _ in range(900):
        y, x = rng.integers(25, h - 30), rng.integers(25, w - 25)
        s = rng.integers(3, 8)
        img[y : y + s, x : x + s] = rng.uniform(120, 255)
    prev = jnp.asarray(img[:, :w])
    nxt = jnp.asarray(img[:, 6 : 6 + w])
    pts = jnp.asarray(
        np.stack(
            [rng.uniform(40, w - 40, num_points), rng.uniform(40, h - 40, num_points)],
            axis=-1,
        ).astype(np.float32)
    )
    mask = jnp.ones(num_points, dtype=bool)
    cfg = LKConfig()

    out = lk_track(prev, nxt, pts, mask, cfg)  # compile
    jax.block_until_ready(out)
    valid = int(np.asarray(out[2]).sum())

    report = {}
    with measured(report):
        for _ in range(repeats):
            out = lk_track(prev, nxt, pts, mask, cfg)
        jax.block_until_ready(out)
    per_call_ms = report["elapsed_s"] * 1000.0 / repeats
    emit(
        "lk_flow_tracks_per_sec",
        num_points * repeats / report["elapsed_s"],
        "tracks/s",
        per_call_ms=round(per_call_ms, 3),
        num_points=num_points,
        valid_tracks=valid,
        **report,
    )


if __name__ == "__main__":
    main()
