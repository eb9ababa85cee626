"""Native (C++) data-plane: decode parity, loader ordering, backpressure.

Covers the native counterpart of the reference's decode stage
(reference ``frame_stream.py`` loader thread and ``ingestion_pipeline.py``
worker pool + deterministic reorder buffer): PNG/PGM decode bit-parity
with the cv2 path, strict in-order delivery from out-of-order workers,
failure statuses, and the ``--ingestion native`` runner mode.
"""

import numpy as np
import pytest

from mvslam_tpu import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="C++ toolchain/libpng unavailable"
)


def _write_png(path, array, mode="L"):
    from PIL import Image

    Image.fromarray(array, mode).save(path)


class TestDecode:
    def test_gray_png_bit_exact(self, tmp_path):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, size=(48, 64), dtype=np.uint8)
        p = tmp_path / "g.png"
        _write_png(p, img)
        out = native.decode_gray(p)
        assert out is not None and out.dtype == np.uint8
        np.testing.assert_array_equal(out, img)

    def test_rgb_png_matches_cv2_grayscale(self, tmp_path):
        cv2 = pytest.importorskip("cv2")
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
        p = tmp_path / "c.png"
        _write_png(p, img, "RGB")
        out = native.decode_gray(p)
        ref = cv2.imread(str(p), cv2.IMREAD_GRAYSCALE)
        # Same BT.601 fixed-point luma; identical rounding observed, but
        # allow 1 LSB of slack across libpng/cv2 versions.
        assert int(np.abs(out.astype(int) - ref.astype(int)).max()) <= 1

    def test_palette_png_with_transparency(self, tmp_path):
        """Palette PNG with a tRNS chunk: the tRNS expansion adds an alpha
        channel that must be stripped (regression: rows were written at
        2-4 bytes/pixel into a 1 byte/pixel stride)."""
        from PIL import Image

        import numpy as np

        rng = np.random.default_rng(7)
        img = rng.integers(0, 255, size=(24, 32), dtype=np.uint8)
        pal = Image.fromarray(img, "L").convert("P")
        pal.info["transparency"] = 0  # adds a tRNS chunk on save
        p = tmp_path / "pal.png"
        pal.save(p, transparency=0)
        out = native.decode_gray(p)
        assert out is not None and out.shape == (24, 32) and out.dtype == np.uint8
        # The luma of the palette-expanded RGB must match the original gray
        # (palette entries are gray so BT.601 luma is the identity +-1).
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1

    def test_pgm_roundtrip(self, tmp_path):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(33, 47), dtype=np.uint8)
        p = tmp_path / "x.pgm"
        with open(p, "wb") as f:
            f.write(b"P5\n# a comment\n47 33\n255\n")
            f.write(img.tobytes())
        np.testing.assert_array_equal(native.decode_gray(p), img)

    def test_pgm_maxval_scaling(self, tmp_path):
        """Non-255 maxval rescales to [0,255] with rounding (8- and 16-bit)."""
        # 8-bit, maxval=100: v -> round(v*255/100)
        vals = np.array([[0, 1, 50, 99, 100]], dtype=np.uint8)
        p8 = tmp_path / "m100.pgm"
        with open(p8, "wb") as f:
            f.write(b"P5\n5 1\n100\n")
            f.write(vals.tobytes())
        expect8 = np.round(vals.astype(np.int64) * 255 / 100).astype(np.uint8)
        np.testing.assert_array_equal(native.decode_gray(p8), expect8)
        # 16-bit big-endian, maxval=65535: v -> round(v*255/65535), NOT v>>8
        v16 = np.array([[0, 128, 255, 256, 65535, 32768]], dtype=np.uint16)
        p16 = tmp_path / "m16.pgm"
        with open(p16, "wb") as f:
            f.write(b"P5\n6 1\n65535\n")
            f.write(v16.byteswap().tobytes())  # big-endian sample order
        expect16 = np.round(v16.astype(np.int64) * 255 / 65535).astype(np.uint8)
        np.testing.assert_array_equal(native.decode_gray(p16), expect16)

    def test_missing_and_corrupt_files(self, tmp_path):
        assert native.decode_gray(tmp_path / "nope.png") is None
        bad = tmp_path / "bad.png"
        bad.write_bytes(b"\x89PNG\r\n\x1a\n" + b"garbage" * 10)
        assert native.decode_gray(bad) is None
        notimg = tmp_path / "x.txt"
        notimg.write_bytes(b"hello world")
        assert native.decode_gray(notimg) is None

    def test_capacity_guard(self, tmp_path):
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, size=(16, 20), dtype=np.uint8)
        p = tmp_path / "g.png"
        _write_png(p, img)
        assert native.decode_gray(p, max_h=8, max_w=8) is None

    def test_default_read_fn_uses_native(self, tmp_path, monkeypatch):
        from mvslam_tpu.runtime.frame_stream import _default_read_fn

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
        p = tmp_path / "g.png"
        _write_png(p, img)
        monkeypatch.setenv("MVSLAM_NATIVE_DECODE", "1")
        np.testing.assert_array_equal(_default_read_fn(p), img)
        assert _default_read_fn(tmp_path / "missing.png") is None


class TestNativeFrameLoader:
    def _make_frames(self, tmp_path, n, h=24, w=32):
        rng = np.random.default_rng(6)
        frames, paths = [], []
        for i in range(n):
            img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
            p = tmp_path / f"f{i:04d}.png"
            _write_png(p, img)
            frames.append(img)
            paths.append(p)
        return frames, paths

    def test_in_order_delivery_many_workers(self, tmp_path):
        frames, paths = self._make_frames(tmp_path, 64)
        with native.NativeFrameLoader(paths, workers=8, capacity=4) as loader:
            items = list(loader)
            stats = loader.stats()
        assert [it.index for it in items] == list(range(64))
        for it, ref in zip(items, frames):
            assert it.status == "ok"
            np.testing.assert_array_equal(it.frame, ref)
        assert stats.decoded == 64 and stats.failed == 0

    def test_failures_reported_in_sequence(self, tmp_path):
        frames, paths = self._make_frames(tmp_path, 10)
        paths[3] = tmp_path / "missing.png"
        bad = tmp_path / "bad.png"
        bad.write_bytes(b"\x89PNG\r\n\x1a\nnot a png")
        paths[7] = bad
        with native.NativeFrameLoader(paths, workers=3, capacity=2) as loader:
            items = list(loader)
            stats = loader.stats()
        assert [it.index for it in items] == list(range(10))
        assert items[3].status == "open_failed" and items[3].frame is None
        assert items[7].status == "corrupt" and items[7].frame is None
        assert stats.decoded == 8 and stats.failed == 2

    def test_empty_and_single(self, tmp_path):
        with native.NativeFrameLoader([], workers=2, capacity=2) as loader:
            assert list(loader) == []
        frames, paths = self._make_frames(tmp_path, 1)
        with native.NativeFrameLoader(paths, workers=4, capacity=8) as loader:
            items = list(loader)
        assert len(items) == 1
        np.testing.assert_array_equal(items[0].frame, frames[0])

    def test_early_close_does_not_hang(self, tmp_path):
        _, paths = self._make_frames(tmp_path, 32)
        loader = native.NativeFrameLoader(paths, workers=4, capacity=2)
        it = iter(loader)
        next(it)
        next(it)
        loader.close()  # workers blocked on backpressure must exit

    def test_deterministic_across_runs(self, tmp_path):
        _, paths = self._make_frames(tmp_path, 24)

        def run():
            with native.NativeFrameLoader(paths, workers=6, capacity=3) as loader:
                return [(it.index, it.frame.sum()) for it in loader]

        assert run() == run()


class TestNativeIngestionMode:
    def test_runner_native_mode(self, tmp_path):
        from test_slam_runner import write_fake_kitti

        from mvslam_tpu.slam.runner import run_kitti_sequence

        root = write_fake_kitti(tmp_path / "kitti", num_frames=4)
        result = run_kitti_sequence(
            root,
            sequence="00",
            run_id="native_run",
            output_root=tmp_path / "runs",
            ingestion="native",
        )
        assert result.num_frames == 4
        report = result.run_dir / "reports" / "ingestion_report.json"
        assert report.exists()
