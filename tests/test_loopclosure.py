"""Loop closure / persistent map / relocalization tests (reference parity:
tests/test_pose_graph_loop.py BoW tests, persistent map tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvslam_tpu.loopclosure.bow import (
    BoWConfig,
    BoWDatabase,
    compute_bow_histogram,
    train_vocabulary,
)
from mvslam_tpu.loopclosure.map_builder import MapBuilderConfig, MapSnapshotBuilder
from mvslam_tpu.loopclosure.persistent_map import (
    MapKeyframe,
    MapRelocalizer,
    PersistentMapSnapshot,
    load_map_snapshot,
    save_map_snapshot,
)
from mvslam_tpu.loopclosure.validation import (
    LoopClosureSample,
    LoopClosureVerificationThresholds,
    score_loop_closure_sample,
    validate_loop_closures,
)


def random_descriptors(n, seed=0, cluster=None):
    rng = np.random.default_rng(seed)
    if cluster is None:
        return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)
    base = np.random.default_rng(cluster).integers(0, 2**32, size=(1, 8), dtype=np.uint32)
    # flip a few random bits from the cluster center
    out = np.tile(base, (n, 1))
    for i in range(n):
        for _ in range(4):
            w = rng.integers(0, 8)
            out[i, w] ^= np.uint32(1) << np.uint32(rng.integers(0, 32))
    return out


class TestVocabulary:
    def test_train_and_assign(self):
        desc = np.concatenate([random_descriptors(200, seed=s, cluster=s) for s in range(4)])
        vocab = train_vocabulary(desc, jax.random.key(0), vocab_size=16, iterations=10)
        assert vocab.shape == (16, 256)
        hist = compute_bow_histogram(desc[:100], np.ones(100, bool), vocab)
        assert hist.shape == (16,)
        assert np.linalg.norm(hist) == pytest.approx(1.0, abs=1e-5)

    def test_deterministic(self):
        desc = random_descriptors(300, seed=1)
        v1 = train_vocabulary(desc, jax.random.key(3), 8)
        v2 = train_vocabulary(desc, jax.random.key(3), 8)
        assert np.array_equal(v1, v2)

    def test_too_few_descriptors_raises(self):
        with pytest.raises(ValueError):
            train_vocabulary(random_descriptors(4), jax.random.key(0), vocab_size=16)


class TestBoWDatabase:
    def test_detects_revisited_place(self):
        cfg = BoWConfig(vocab_size=16, min_frame_gap=5, similarity_threshold=0.8,
                        min_train_descriptors_factor=10)
        db = BoWDatabase(cfg, key=jax.random.key(0))
        # Distinct "places" with clustered descriptors.
        places = [random_descriptors(80, seed=100 + p, cluster=p) for p in range(4)]
        for fid, p in enumerate(places):
            db.add_frame(fid, p)
        assert db.is_trained
        # Revisit place 1 at frame 10 (gap 9 ≥ 5).
        revisit = random_descriptors(80, seed=999, cluster=1)
        hit = db.detect_loop(10, revisit)
        assert hit is not None
        cand, score = hit
        assert cand == 1
        assert score > 0.8


    def test_process_keyframe_matches_detect_then_add(self):
        """Fused query-then-add must agree with detect_loop + add_frame and
        compute exactly ONE histogram (one device round trip per keyframe —
        the tunneled-chip cost model that motivated the fusion)."""
        import mvslam_tpu.loopclosure.bow as bow_mod

        def build():
            cfg = BoWConfig(vocab_size=16, min_frame_gap=5, similarity_threshold=0.8,
                            min_train_descriptors_factor=10)
            db = BoWDatabase(cfg, key=jax.random.key(0))
            for fid in range(4):
                db.add_frame(fid, random_descriptors(80, seed=100 + fid, cluster=fid))
            assert db.is_trained
            return db

        revisit = random_descriptors(80, seed=999, cluster=1)
        a = build()
        hit_legacy = a.detect_loop(10, revisit)
        a.add_frame(10, revisit)
        b = build()
        calls = {"n": 0}
        real = bow_mod.compute_bow_histogram

        def counting(*args, **kwargs):
            calls["n"] += 1
            return real(*args, **kwargs)

        bow_mod.compute_bow_histogram = counting
        try:
            hit_fused = b.process_keyframe(10, revisit)
        finally:
            bow_mod.compute_bow_histogram = real
        assert calls["n"] == 1
        assert hit_fused == hit_legacy
        np.testing.assert_array_equal(a.histograms[-1], b.histograms[-1])
        assert a.frame_ids == b.frame_ids

    def test_no_loop_within_gap(self):
        cfg = BoWConfig(vocab_size=16, min_frame_gap=50, min_train_descriptors_factor=5)
        db = BoWDatabase(cfg, key=jax.random.key(0))
        for fid in range(4):
            db.add_frame(fid, random_descriptors(80, seed=fid, cluster=0))
        assert db.detect_loop(5, random_descriptors(80, seed=9, cluster=0)) is None

    def test_export_vocabulary(self):
        db = BoWDatabase(BoWConfig(vocab_size=8, min_train_descriptors_factor=5), key=jax.random.key(1))
        assert db.export_vocabulary() is None
        db.add_frame(0, random_descriptors(100, seed=0))
        assert db.export_vocabulary() is not None


class TestDeviceBoWIndex:
    def _hists(self, n=12, vocab=16, seed=0):
        rng = np.random.default_rng(seed)
        h = rng.uniform(0, 1, size=(n, vocab)).astype(np.float32)
        return h / np.linalg.norm(h, axis=1, keepdims=True)

    def test_topk_matches_numpy_ranking(self):
        from mvslam_tpu.loopclosure.device_index import DeviceBoWIndex

        hists = self._hists()
        index = DeviceBoWIndex(16, capacity=16)
        for fid, h in enumerate(hists):
            index.add(fid * 3, h)
        q = self._hists(1, seed=7)[0]
        ref_scores = hists @ q
        ref_order = np.argsort(-ref_scores)[:5]
        got = index.topk(q, k=5)
        assert [fid for fid, _ in got] == [int(i) * 3 for i in ref_order]
        np.testing.assert_allclose(
            [s for _, s in got], ref_scores[ref_order], atol=1e-6
        )
        np.testing.assert_allclose(index.scores(q), ref_scores, atol=1e-6)

    def test_capacity_overflow_grows(self):
        """A long sequence must never crash on index capacity (ADVICE r2):
        the buffer doubles and ranking stays exact across the growth."""
        from mvslam_tpu.loopclosure.device_index import DeviceBoWIndex

        index = DeviceBoWIndex(16, capacity=2)
        h = self._hists(5)
        for fid in range(5):
            index.add(fid, h[fid])
        assert index.capacity >= 5
        assert len(index) == 5
        q = self._hists(1, seed=9)[0]
        ref = h @ q
        np.testing.assert_allclose(index.scores(q), ref, atol=1e-6)
        assert index.topk(q, k=1)[0][0] == int(np.argmax(ref))

    def test_non_monotone_frame_ids_rejected(self):
        """Monotone insertion is what makes the device top-k tie-break
        equal the host (-score, frame_id) order across the k cutoff."""
        from mvslam_tpu.loopclosure.device_index import DeviceBoWIndex

        h = self._hists(3)
        index = DeviceBoWIndex(16, capacity=4)
        index.add(5, h[0])
        with pytest.raises(ValueError, match="increasing"):
            index.add(5, h[1])
        with pytest.raises(ValueError, match="increasing"):
            DeviceBoWIndex.from_histograms([3, 1, 2], h)

    def test_tied_scores_across_cutoff_match_host_order(self):
        from mvslam_tpu.loopclosure.device_index import DeviceBoWIndex

        vocab = 16
        # Three identical rows (exact ties) + one distinct: with k=2 the
        # tie straddles the cutoff; device must pick the lowest frame ids.
        base = self._hists(1, seed=2)[0]
        other = self._hists(1, seed=4)[0]
        rows = np.stack([other, base, base, base])
        index = DeviceBoWIndex.from_histograms([0, 10, 20, 30], rows, capacity=4)
        got = index.topk(base, k=2)
        assert [f for f, _ in got] == [10, 20]

    def test_bulk_load_matches_incremental(self):
        from mvslam_tpu.loopclosure.device_index import DeviceBoWIndex

        hists = self._hists(6)
        inc = DeviceBoWIndex(16, capacity=8)
        for fid, h in enumerate(hists):
            inc.add(fid, h)
        bulk = DeviceBoWIndex.from_histograms(range(6), hists, capacity=8)
        q = self._hists(1, seed=3)[0]
        assert inc.topk(q, k=3) == bulk.topk(q, k=3)

    def test_bow_database_device_path_matches_host(self):
        cfg_host = BoWConfig(vocab_size=16, min_frame_gap=5, similarity_threshold=0.8,
                             min_train_descriptors_factor=10)
        cfg_dev = BoWConfig(vocab_size=16, min_frame_gap=5, similarity_threshold=0.8,
                            min_train_descriptors_factor=10, device_index_capacity=32)
        db_host = BoWDatabase(cfg_host, key=jax.random.key(0))
        db_dev = BoWDatabase(cfg_dev, key=jax.random.key(0))
        places = [random_descriptors(80, seed=100 + p, cluster=p) for p in range(4)]
        for fid, p in enumerate(places):
            db_host.add_frame(fid, p)
            db_dev.add_frame(fid, p)
        assert db_dev.is_trained
        revisit = random_descriptors(80, seed=999, cluster=1)
        rank_host = db_host.rank(revisit)
        rank_dev = db_dev.rank(revisit)
        assert [f for f, _ in rank_host] == [f for f, _ in rank_dev]
        np.testing.assert_allclose(
            [s for _, s in rank_host], [s for _, s in rank_dev], atol=1e-5
        )
        assert db_dev.detect_loop(10, revisit) == db_host.detect_loop(10, revisit)
        assert db_dev.detect_loop(2, revisit) == db_host.detect_loop(2, revisit)


def make_keyframes(num=3, n_pts=128, seed=0):
    rng = np.random.default_rng(seed)
    kfs = []
    for k in range(num):
        pose = np.eye(4)
        pose[0, 3] = float(k)
        kfs.append(
            MapKeyframe(
                frame_id=k * 10,
                pose=pose,
                keypoints=rng.uniform(50, 400, size=(n_pts, 2)).astype(np.float32),
                descriptors=random_descriptors(n_pts, seed=k, cluster=k),
                valid=np.ones(n_pts, bool),
            )
        )
    return kfs


class TestPersistentMap:
    def test_build_save_load_roundtrip(self, tmp_path):
        kfs = make_keyframes()
        builder = MapSnapshotBuilder(MapBuilderConfig(vocab_size=16), key=jax.random.key(0))
        snapshot, stats = builder.build_snapshot(kfs)
        assert stats.num_keyframes == 3
        arrays = tmp_path / "map_arrays.npz"
        meta = tmp_path / "map_metadata.json"
        save_map_snapshot(snapshot, arrays, meta)
        loaded = load_map_snapshot(arrays, meta)
        assert loaded.digest() == snapshot.digest()
        assert len(loaded.keyframes) == 3
        assert np.array_equal(loaded.vocabulary, snapshot.vocabulary)

    def test_digest_detects_tampering(self, tmp_path):
        kfs = make_keyframes()
        snapshot, _ = MapSnapshotBuilder(MapBuilderConfig(vocab_size=16)).build_snapshot(kfs)
        arrays = tmp_path / "a.npz"
        meta = tmp_path / "m.json"
        save_map_snapshot(snapshot, arrays, meta)
        # Corrupt arrays: re-save with a different pose.
        snapshot.keyframes[0].pose[0, 3] += 5.0
        save_map_snapshot(snapshot, arrays, tmp_path / "m2.json")
        with pytest.raises(ValueError, match="digest"):
            load_map_snapshot(arrays, meta)

    def test_schema_version_check(self, tmp_path):
        kfs = make_keyframes()
        snapshot, _ = MapSnapshotBuilder(MapBuilderConfig(vocab_size=16)).build_snapshot(kfs)
        arrays = tmp_path / "a.npz"
        meta = tmp_path / "m.json"
        save_map_snapshot(snapshot, arrays, meta)
        import json

        payload = json.loads(meta.read_text())
        payload["schema_version"] = 99
        meta.write_text(json.dumps(payload))
        with pytest.raises(ValueError, match="schema"):
            load_map_snapshot(arrays, meta)


class TestRelocalizer:
    def test_relocalizes_against_matching_keyframe(self):
        """A query sharing a keyframe's descriptors and shifted keypoints
        should geometrically verify against that keyframe."""
        rng = np.random.default_rng(3)
        n = 256
        K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        # Build a 3D scene seen by the keyframe and a translated query view.
        pts3d = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(5, 12, n)], 1)
        uv_kf = (pts3d[:, :2] / pts3d[:, 2:]) * [500, 500] + [320, 240]
        t = np.array([0.4, 0.0, 0.1])
        cam_q = pts3d + t
        uv_q = (cam_q[:, :2] / cam_q[:, 2:]) * [500, 500] + [320, 240]
        desc = random_descriptors(n, seed=7)

        kf = MapKeyframe(
            frame_id=0,
            pose=np.eye(4),
            keypoints=uv_kf.astype(np.float32),
            descriptors=desc,
            valid=np.ones(n, bool),
        )
        decoy = make_keyframes(num=1, seed=99)[0]
        decoy.frame_id = 50
        builder = MapSnapshotBuilder(MapBuilderConfig(vocab_size=16), key=jax.random.key(0))
        snapshot, _ = builder.build_snapshot([kf, decoy])
        reloc = MapRelocalizer(snapshot, K, min_inliers=20, key=jax.random.key(1))
        hit = reloc.relocalize(uv_q.astype(np.float32), desc, np.ones(n, bool))
        assert hit is not None
        kf_pose, rel, info = hit
        assert info["matched_keyframe"] == 0
        assert info["num_inliers"] >= 100
        # Points shifted +t in query-camera coords ⇒ the camera moved −t in
        # world; the re-anchored pose translation is along −t (unit scale).
        new_pose = kf_pose @ rel
        direction = new_pose[:3, 3] / np.linalg.norm(new_pose[:3, 3])
        t_unit = t / np.linalg.norm(t)
        assert np.abs(direction + t_unit).max() < 0.1

    def test_device_index_relocalization_matches_host(self):
        """device_index=True scores candidates in HBM; same relocalization
        result as the host-matvec path."""
        rng = np.random.default_rng(3)
        n = 256
        K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        pts3d = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(5, 12, n)], 1)
        uv_kf = (pts3d[:, :2] / pts3d[:, 2:]) * [500, 500] + [320, 240]
        cam_q = pts3d + np.array([0.4, 0.0, 0.1])
        uv_q = (cam_q[:, :2] / cam_q[:, 2:]) * [500, 500] + [320, 240]
        desc = random_descriptors(n, seed=7)
        kf = MapKeyframe(
            frame_id=0, pose=np.eye(4), keypoints=uv_kf.astype(np.float32),
            descriptors=desc, valid=np.ones(n, bool),
        )
        decoy = make_keyframes(num=1, seed=99)[0]
        decoy.frame_id = 50
        builder = MapSnapshotBuilder(MapBuilderConfig(vocab_size=16), key=jax.random.key(0))
        snapshot, _ = builder.build_snapshot([kf, decoy])
        host = MapRelocalizer(snapshot, K, min_inliers=20, key=jax.random.key(1))
        dev = MapRelocalizer(
            snapshot, K, min_inliers=20, key=jax.random.key(1), device_index=True
        )
        hit_host = host.relocalize(uv_q.astype(np.float32), desc, np.ones(n, bool))
        hit_dev = dev.relocalize(uv_q.astype(np.float32), desc, np.ones(n, bool))
        assert hit_host is not None and hit_dev is not None
        assert hit_dev[2]["matched_keyframe"] == hit_host[2]["matched_keyframe"]
        np.testing.assert_allclose(hit_dev[1], hit_host[1], atol=1e-6)

    def test_no_match_returns_none(self):
        snapshot, _ = MapSnapshotBuilder(MapBuilderConfig(vocab_size=16)).build_snapshot(
            make_keyframes(num=2)
        )
        reloc = MapRelocalizer(snapshot, np.eye(3), min_inliers=20)
        rng = np.random.default_rng(0)
        hit = reloc.relocalize(
            rng.uniform(0, 100, (64, 2)).astype(np.float32),
            random_descriptors(64, seed=12345),
            np.ones(64, bool),
        )
        assert hit is None


class TestValidation:
    def good_sample(self, **kw):
        defaults = dict(
            query_frame=100,
            candidate_frame=10,
            inlier_ratio=0.8,
            reprojection_error_px=1.0,
            match_count=80,
            rotation_error_deg=2.0,
            translation_error=0.2,
        )
        defaults.update(kw)
        return LoopClosureSample(**defaults)

    def test_good_sample_accepted(self):
        verdict = score_loop_closure_sample(self.good_sample())
        assert verdict.accepted
        assert verdict.combined_score > 0.5

    def test_rejections_have_reasons(self):
        verdict = score_loop_closure_sample(self.good_sample(inlier_ratio=0.1))
        assert not verdict.accepted
        assert any("inlier_ratio" in r for r in verdict.rejection_reasons)
        verdict = score_loop_closure_sample(self.good_sample(candidate_frame=95))
        assert any("temporal_gap" in r for r in verdict.rejection_reasons)

    def test_report_classification(self):
        samples = [
            self.good_sample(is_true_loop=True),
            self.good_sample(inlier_ratio=0.05, is_true_loop=False),  # TN
            self.good_sample(is_true_loop=False),  # FP
            self.good_sample(inlier_ratio=0.05, is_true_loop=True),  # FN
        ]
        report = validate_loop_closures(samples)
        assert report.true_positive == 1
        assert report.true_negative == 1
        assert report.false_positive == 1
        assert report.false_negative == 1
        assert report.precision == pytest.approx(0.5)
        assert report.recall == pytest.approx(0.5)
        assert report.digest
        # Digest deterministic
        assert validate_loop_closures(samples).digest == report.digest
