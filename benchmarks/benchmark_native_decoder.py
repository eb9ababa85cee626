"""Native C++ decode + loader throughput vs the Python (cv2) decode path.

The native data-plane (``mvslam_tpu.native``) replaces the reference's
cv2.imread worker threads (reference ``ingestion_pipeline.py``) with a C++
decode pool and in-order slot ring. This benchmark writes KITTI-sized
(370x1226) grayscale PNGs to a tmpdir, then measures:

  * single-threaded decode: native mvn_decode_gray vs cv2.imread
  * end-to-end ordered loading: NativeFrameLoader (N C++ workers)
    vs FrameStream (1 Python thread + cv2)
"""

from __future__ import annotations

import tempfile
from pathlib import Path

import numpy as np

from benchmarks._harness import emit, run_benchmark

H, W = 370, 1226


def _write_frames(root: Path, n: int) -> list:
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        img = rng.integers(0, 256, size=(H, W), dtype=np.uint8)
        p = root / f"{i:06d}.png"
        Image.fromarray(img, "L").save(p)
        paths.append(p)
    return paths


def main(n_frames: int = 60, workers: int = 6) -> None:
    from mvslam_tpu import native

    if not native.native_available():
        emit("native_decoder_available", 0, "bool")
        return
    emit("native_decoder_available", 1, "bool")

    with tempfile.TemporaryDirectory() as tmp:
        paths = _write_frames(Path(tmp), n_frames)

        run_benchmark(
            "native_decode_single_thread",
            lambda: [native.decode_gray(p) for p in paths],
            items=n_frames,
            unit="frames/s",
        )

        try:
            import cv2

            run_benchmark(
                "cv2_decode_single_thread",
                lambda: [cv2.imread(str(p), cv2.IMREAD_GRAYSCALE) for p in paths],
                items=n_frames,
                unit="frames/s",
            )
        except ImportError:
            pass

        def native_loader():
            with native.NativeFrameLoader(paths, workers=workers, capacity=16) as loader:
                count = sum(1 for item in loader if item.status == "ok")
            assert count == n_frames
            return count

        run_benchmark(
            f"native_loader_{workers}_workers",
            native_loader,
            items=n_frames,
            unit="frames/s",
        )

        from mvslam_tpu.runtime.frame_stream import FrameStream

        def python_stream():
            stream = FrameStream(paths, buffer_size=16)
            return sum(1 for _ in stream)

        run_benchmark(
            "python_frame_stream_cv2",
            python_stream,
            items=n_frames,
            unit="frames/s",
        )


if __name__ == "__main__":
    main()
