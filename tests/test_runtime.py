"""Control-plane runtime tests (reference parity: ingestion/control-plane
unit + stress tests, tests/test_failure_injection.py, hub/supervisor tests)."""

import threading
import time

import numpy as np
import pytest

from mvslam_tpu.runtime.failure_injection import (
    FailureInjectionChaosHarness,
    FailureInjectionConfig,
    FailureInjectionHarness,
    build_failure_plan,
)
from mvslam_tpu.runtime.hub import (
    ControlPlaneHub,
    ControlPlaneStageAdapter,
    DeterministicEventBus,
    StageEventEnvelope,
)
from mvslam_tpu.runtime.ingestion import AsyncIngestionPipeline, IngestionPipelineConfig
from mvslam_tpu.runtime.ingestion_control import (
    AdaptiveBoundedQueue,
    CircuitBreaker,
    CircuitBreakerConfig,
    DeterministicEventLog,
    DeterministicReorderBuffer,
    DynamicWorkerPool,
    MovingAverage,
    OrderingBufferConfig,
    QueueTuningConfig,
    StageSupervisor,
    WorkerPoolConfig,
)
from mvslam_tpu.runtime.supervisor import (
    ControlPlaneSupervisor,
    ControlPlaneSupervisorConfig,
)


class TestAdaptiveQueue:
    def test_put_get_fifo(self):
        q = AdaptiveBoundedQueue(4)
        for i in range(4):
            assert q.put(i, timeout=0.1)
        assert not q.put(99, timeout=0.05)  # full
        out = [q.get(timeout=0.1)[1] for _ in range(4)]
        assert out == [0, 1, 2, 3]

    def test_resize_unblocks(self):
        q = AdaptiveBoundedQueue(1)
        q.put("a")
        results = []

        def blocked_put():
            results.append(q.put("b", timeout=2.0))

        t = threading.Thread(target=blocked_put)
        t.start()
        time.sleep(0.05)
        q.resize(4)
        t.join(timeout=2.0)
        assert results == [True]

    def test_concurrent_stress_no_loss(self):
        q = AdaptiveBoundedQueue(8)
        received = []
        lock = threading.Lock()

        def producer(base):
            for i in range(100):
                q.put(base + i, timeout=5.0)

        def consumer():
            while True:
                ok, item = q.get(timeout=0.3)
                if not ok:
                    return
                with lock:
                    received.append(item)

        producers = [threading.Thread(target=producer, args=(k * 1000,)) for k in range(3)]
        consumers = [threading.Thread(target=consumer) for _ in range(2)]
        for t in producers + consumers:
            t.start()
        for t in producers:
            t.join()
        for t in consumers:
            t.join()
        assert len(received) == 300
        assert len(set(received)) == 300


class TestCircuitBreaker:
    def test_trip_and_recover(self):
        clock = [0.0]
        cb = CircuitBreaker(
            CircuitBreakerConfig(failure_threshold=3, recovery_timeout_s=1.0, half_open_successes=2),
            clock=lambda: clock[0],
        )
        assert cb.state == "closed"
        for _ in range(3):
            cb.record_failure()
        assert cb.state == "open"
        assert not cb.allow()
        clock[0] = 1.5
        assert cb.state == "half_open"
        assert cb.allow()
        cb.record_success()
        cb.record_success()
        assert cb.state == "closed"

    def test_half_open_failure_reopens(self):
        clock = [0.0]
        cb = CircuitBreaker(
            CircuitBreakerConfig(failure_threshold=1, recovery_timeout_s=0.5),
            clock=lambda: clock[0],
        )
        cb.record_failure()
        clock[0] = 1.0
        assert cb.state == "half_open"
        cb.record_failure()
        assert cb.state == "open"
        assert cb.trip_count == 2


class TestReorderBuffer:
    def test_in_order_release(self):
        buf = DeterministicReorderBuffer()
        buf.push(1, "b")
        buf.push(2, "c")
        assert buf.pop_ready() == []
        buf.push(0, "a")
        assert [s for s, _ in buf.pop_ready()] == [0, 1, 2]

    def test_forced_flush_skips_gap(self):
        buf = DeterministicReorderBuffer(OrderingBufferConfig(max_pending=4, forced_flush_ratio=0.5))
        for seq in (5, 3, 7):  # missing 0..2 → pressure builds
            buf.push(seq, seq)
        out = buf.pop_ready()
        seqs = [s for s, _ in out]
        assert seqs and seqs[0] == 3 and seqs == sorted(seqs)
        assert buf.forced_flushes >= 1
        assert buf.skipped_seqs >= 3  # the 0..2 gap was jumped


class TestStageSupervision:
    def test_queue_grows_under_pressure(self):
        q = AdaptiveBoundedQueue(4)
        pool = DynamicWorkerPool(WorkerPoolConfig(min_workers=1, max_workers=4))
        sup = StageSupervisor(q, pool, QueueTuningConfig(max_capacity=16))
        for i in range(4):
            q.put(i)
        for _ in range(10):
            sup.tick()
        assert q.capacity > 4
        assert pool.target > 1

    def test_queue_shrinks_when_idle(self):
        q = AdaptiveBoundedQueue(16)
        pool = DynamicWorkerPool()
        sup = StageSupervisor(q, pool, QueueTuningConfig(min_capacity=2))
        for _ in range(10):
            sup.tick()
        assert q.capacity < 16

    def test_moving_average(self):
        ema = MovingAverage(alpha=0.5)
        ema.update(0.0)
        assert ema.update(1.0) == pytest.approx(0.5)


def synthetic_read_fn(path):
    """Deterministic synthetic frame; fails for paths containing 'bad'."""
    if "bad" in str(path):
        return None
    idx = int(str(path).split("_")[-1].split(".")[0])
    rng = np.random.default_rng(idx)
    return rng.integers(0, 255, size=(32, 48), dtype=np.uint8)


class TestAsyncIngestion:
    def _paths(self, n, bad=()):
        return [f"frame_{'bad_' if i in bad else ''}{i}.png" for i in range(n)]

    def test_ordered_decode(self):
        pipeline = AsyncIngestionPipeline(
            self._paths(20),
            config=IngestionPipelineConfig(num_workers=3, supervise=True),
            read_fn=synthetic_read_fn,
        )
        packets = list(pipeline)
        assert [p.index for p in packets] == list(range(20))
        assert pipeline.failure_report().decoded == 20

    def test_failed_decodes_dropped_and_reported(self):
        pipeline = AsyncIngestionPipeline(
            self._paths(10, bad={3, 7}),
            config=IngestionPipelineConfig(num_workers=2),
            read_fn=synthetic_read_fn,
        )
        packets = list(pipeline)
        assert [p.index for p in packets] == [0, 1, 2, 4, 5, 6, 8, 9]
        report = pipeline.failure_report()
        assert report.failed == 2
        assert report.dropped == 2
        assert report.retries >= 2
        assert pipeline.health_snapshot()["stage"] == "ingestion"

    def test_breaker_trips_on_failure_storm(self):
        from mvslam_tpu.runtime.ingestion_control import CircuitBreakerConfig as CBC

        pipeline = AsyncIngestionPipeline(
            self._paths(20, bad=set(range(12))),
            config=IngestionPipelineConfig(
                num_workers=1,
                breaker=CBC(failure_threshold=3, recovery_timeout_s=60.0),
                retry=__import__(
                    "mvslam_tpu.runtime.ingestion_control", fromlist=["RetryPolicyConfig"]
                ).RetryPolicyConfig(max_attempts=1),
            ),
            read_fn=synthetic_read_fn,
        )
        list(pipeline)
        assert pipeline.breaker.trip_count >= 1


class TestHub:
    def _adapter(self, name, events):
        return ControlPlaneStageAdapter(
            name=name,
            health_snapshot=lambda: {"stage": name, "state": "healthy"},
            events=lambda: events,
        )

    def test_merge_order_and_digests(self):
        e1 = [{"type": "a", "message": "m", "timestamp_s": 2.0, "metadata": {}}]
        e2 = [
            {"type": "b", "message": "m", "timestamp_s": 1.0, "metadata": {}},
            {"type": "c", "message": "m", "timestamp_s": 3.0, "metadata": {}},
        ]
        hub = ControlPlaneHub([self._adapter("s1", e1), self._adapter("s2", e2)])
        report = hub.generate_report()
        assert [e["type"] for e in report.events] == ["b", "a", "c"]
        assert report.event_digest and report.overall_digest
        # Digest stable across regeneration and adapter order.
        hub2 = ControlPlaneHub([self._adapter("s2", e2), self._adapter("s1", e1)])
        assert hub2.generate_report().overall_digest == report.overall_digest

    def test_digest_excludes_timestamps_only_in_snapshot(self):
        bus = DeterministicEventBus(capacity=4)
        for i in range(6):
            bus.publish({"i": i})
        drained = bus.drain()
        assert len(drained) == 4  # bounded
        assert bus.drain() == []


class TestSupervisorFSM:
    def _obs(self, state="healthy", errors=0, trips=0, depth=0.0):
        events = [
            {"type": "decode_error", "message": "failed"} for _ in range(errors)
        ]
        snapshot = {
            "backpressure_ratio": depth,
            "breaker_trips": trips,
            "breaker_state": "open" if state == "tripped" else "closed",
        }
        return snapshot, events

    def test_degradation_and_recovery(self):
        clock = [0.0]
        sup = ControlPlaneSupervisor(
            ControlPlaneSupervisorConfig(recovery_cooldown_s=1.0, consecutive_healthy_required=2),
            clock=lambda: clock[0],
        )
        states = sup.update({"ingestion": self._obs(errors=5)})
        assert states["ingestion"] == "degraded"
        clock[0] = 2.0
        states = sup.update({"ingestion": self._obs()})
        assert states["ingestion"] == "recovering"
        states = sup.update({"ingestion": self._obs()})
        states = sup.update({"ingestion": self._obs()})
        assert states["ingestion"] == "healthy"

    def test_dependency_propagation(self):
        sup = ControlPlaneSupervisor(clock=lambda: 0.0)
        states = sup.update(
            {
                "ingestion": self._obs(state="tripped", errors=10, trips=5),
                "feature": self._obs(),
                "tracking": self._obs(),
            }
        )
        assert states["ingestion"] == "tripped"
        assert states["feature"] == "degraded"  # downstream of tripped
        assert sup.global_state() == "tripped"
        assert len(sup.recovery_queue) >= 1
        assert sup.digest()

    def test_digest_deterministic(self):
        def run():
            sup = ControlPlaneSupervisor(clock=lambda: 0.0)
            sup.update({"ingestion": self._obs(errors=5), "feature": self._obs()})
            sup.update({"ingestion": self._obs(), "feature": self._obs()})
            return sup.digest()

        assert run() == run()


class TestFailureInjection:
    def test_plan_deterministic(self):
        cfg = FailureInjectionConfig(seed=3, num_steps=50, failure_probability=0.2)
        p1 = build_failure_plan(cfg)
        p2 = build_failure_plan(cfg)
        assert p1.digest() == p2.digest()
        assert len(p1.failures) > 0
        assert build_failure_plan(FailureInjectionConfig(seed=4, num_steps=50)).digest() != p1.digest()

    def test_harness_replay(self):
        plan = build_failure_plan(FailureInjectionConfig(seed=1, num_steps=30, failure_probability=0.3))
        harness = FailureInjectionHarness(plan)
        fired = harness.run_all()
        assert fired == len(plan.failures)
        hub = ControlPlaneHub(harness.adapters())
        report = hub.generate_report()
        assert len(report.events) == fired

    def test_chaos_threads_deterministic_digest(self):
        plan = build_failure_plan(FailureInjectionConfig(seed=2, num_steps=60, failure_probability=0.25))
        r1 = FailureInjectionChaosHarness(plan, num_threads=4).run()
        r2 = FailureInjectionChaosHarness(plan, num_threads=2).run()
        assert r1["fired"] == r2["fired"] == len(plan.failures)
        assert r1["event_digest"] == r2["event_digest"]


class TestFeatureTrackingPlanes:
    def _frames(self, n=6, seed=0):
        rng = np.random.default_rng(seed)
        frames = []
        for i in range(n):
            img = rng.uniform(0, 30, size=(96, 128)).astype(np.float32)
            for _ in range(40):
                y, x, s = rng.integers(22, 68), rng.integers(22, 100), rng.integers(3, 7)
                img[y : y + s, x : x + s] = rng.uniform(140, 255)
            frames.append(img)
        return frames

    def test_feature_plane_in_order_results(self):
        from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig
        from mvslam_tpu.runtime.feature_plane import FeatureControlConfig, FeatureControlPlane

        plane = FeatureControlPlane(
            FeaturePipelineConfig(num_features=64, max_matches=32),
            FeatureControlConfig(num_workers=2),
        )
        frames = self._frames()
        for i, f in enumerate(frames):
            assert plane.submit(i, f)
        results = plane.collect(timeout=60.0)
        assert [r.seq_id for r in results] == list(range(6))
        assert all(r.ok for r in results)
        assert results[0].num_features > 5
        health = plane.health_snapshot()
        assert health["submitted"] == 6 and health["completed"] == 6
        plane.close()

    def test_feature_cache_hit(self):
        from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig
        from mvslam_tpu.runtime.feature_plane import FeatureControlConfig, FeatureControlPlane

        plane = FeatureControlPlane(
            FeaturePipelineConfig(num_features=64, max_matches=32),
            FeatureControlConfig(num_workers=1),
        )
        frame = self._frames(1)[0]
        plane.submit(0, frame)
        plane.collect(timeout=60.0)
        plane.submit(1, frame)  # identical frame → cache
        results = plane.collect(timeout=60.0)
        assert results and results[0].from_cache
        assert plane.health_snapshot()["cache_hits"] == 1
        plane.close()

    def test_batch_assembler_matches_batch_api(self):
        """Batch-mode results equal the vmapped pipeline API outputs, and
        a partial batch (3 frames, batch_size 4) flushes on timeout."""
        import jax.numpy as jnp

        from mvslam_tpu.frontend.feature_pipeline import FeaturePipeline, FeaturePipelineConfig
        from mvslam_tpu.runtime.feature_plane import FeatureControlConfig, FeatureControlPlane

        fc = FeaturePipelineConfig(num_features=64, max_matches=32)
        plane = FeatureControlPlane(
            fc, FeatureControlConfig(batch_size=4, flush_timeout_s=0.05)
        )
        frames = self._frames()[:3]
        for i, f in enumerate(frames):
            assert plane.submit(i, f)
        results = plane.collect(timeout=60.0)
        assert [r.seq_id for r in results] == [0, 1, 2]
        health = plane.health_snapshot()
        assert health["batch_mode"] and health["batches"] >= 1
        assert health["mean_batch_fill"] <= 4.0
        plane.close()

        direct = FeaturePipeline(fc).detect_and_describe_batch(jnp.asarray(np.stack(frames)))
        for i, r in enumerate(results):
            np.testing.assert_array_equal(r.keypoints, np.asarray(direct.xy)[i])
            np.testing.assert_array_equal(r.descriptors, np.asarray(direct.descriptors)[i])
            np.testing.assert_array_equal(r.valid, np.asarray(direct.valid)[i])

    def test_batch_assembler_error_marks_all_frames(self):
        from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig
        from mvslam_tpu.runtime.feature_plane import FeatureControlConfig, FeatureControlPlane

        plane = FeatureControlPlane(
            FeaturePipelineConfig(num_features=64, max_matches=32),
            FeatureControlConfig(batch_size=2, flush_timeout_s=0.02),
        )

        def boom(frames):
            raise RuntimeError("device fell over")

        plane._pipeline.detect_and_describe_batch = boom
        frames = self._frames()[:2]
        for i, f in enumerate(frames):
            assert plane.submit(i, f)
        results = plane.collect(timeout=30.0)
        assert len(results) == 2
        assert all(not r.ok and "device fell over" in r.error for r in results)
        assert plane.health_snapshot()["failed"] == 2
        assert any(e["type"] == "feature_error" for e in plane.stage_events())
        plane.close()

    def test_batch_assembler_shape_change_starts_new_batch(self):
        from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig
        from mvslam_tpu.runtime.feature_plane import FeatureControlConfig, FeatureControlPlane

        plane = FeatureControlPlane(
            FeaturePipelineConfig(num_features=64, max_matches=32),
            FeatureControlConfig(batch_size=4, flush_timeout_s=0.2),
        )
        small = self._frames(2)
        big = [np.pad(f, ((0, 32), (0, 0))) for f in self._frames(2)]
        for i, f in enumerate(small + big):
            assert plane.submit(i, f)
        results = plane.collect(timeout=120.0)
        assert [r.seq_id for r in results] == [0, 1, 2, 3]
        assert all(r.ok for r in results)
        assert plane.health_snapshot()["batches"] == 2
        plane.close()

    def test_tracking_plane_pairs_results(self):
        from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig
        from mvslam_tpu.runtime.feature_plane import FeatureControlConfig, FeatureControlPlane
        from mvslam_tpu.runtime.tracking_plane import TrackingControlConfig, TrackingControlPlane

        plane = FeatureControlPlane(
            FeaturePipelineConfig(num_features=64, max_matches=32),
            FeatureControlConfig(num_workers=2),
        )
        tracking = TrackingControlPlane(plane, TrackingControlConfig(max_pending=8))
        frames = self._frames()
        for i, f in enumerate(frames):
            assert tracking.submit_frame(i, 0.1 * i, f)
        results = tracking.collect(timeout=60.0)
        assert [r.seq_id for r in results] == list(range(6))
        assert all(r.ok for r in results)
        assert tracking.health_snapshot()["completed"] == 6
        plane.close()

    def test_tracking_buffer_overflow_drop_oldest(self):
        from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig
        from mvslam_tpu.runtime.feature_plane import FeatureControlConfig, FeatureControlPlane
        from mvslam_tpu.runtime.tracking_plane import PendingFrameBuffer

        buf = PendingFrameBuffer(max_pending=2, ttl_s=60.0, policy="drop_oldest")
        assert buf.add(0, 0.0, np.zeros((2, 2))) is None
        assert buf.add(1, 0.1, np.zeros((2, 2))) is None
        assert buf.add(2, 0.2, np.zeros((2, 2))) == 0  # oldest dropped
        buf_reject = PendingFrameBuffer(max_pending=1, ttl_s=60.0, policy="reject_new")
        buf_reject.add(0, 0.0, np.zeros((2, 2)))
        assert buf_reject.add(1, 0.1, np.zeros((2, 2))) == -1

    def test_pending_ttl_expiry(self):
        from mvslam_tpu.runtime.tracking_plane import PendingFrameBuffer

        clock = [0.0]
        buf = PendingFrameBuffer(max_pending=4, ttl_s=1.0, policy="drop_oldest", clock=lambda: clock[0])
        buf.add(0, 0.0, np.zeros((2, 2)))
        assert buf.expire() == []
        clock[0] = 2.0
        expired = buf.expire()
        assert len(expired) == 1 and expired[0].seq_id == 0


class TestRunStreamAsync:
    def test_async_path_produces_trajectory_and_report(self, tmp_path):
        from mvslam_tpu.backend.keyframes import KeyframeConfig
        from mvslam_tpu.frontend.feature_pipeline import FeaturePipelineConfig
        from mvslam_tpu.frontend.pose_estimator import RobustPoseEstimatorConfig
        from mvslam_tpu.runtime.frame_stream import packets_from_arrays
        from mvslam_tpu.slam.api import SLAMSystem, SLAMSystemConfig

        rng = np.random.default_rng(0)
        num, h, w, shift = 5, 96, 160, 4
        base = rng.uniform(0, 30, size=(h, w + shift * num)).astype(np.float32)
        for _ in range(80):
            y, x, s = rng.integers(22, h - 28), rng.integers(22, base.shape[1] - 28), rng.integers(3, 7)
            base[y : y + s, x : x + s] = rng.uniform(140, 255)
        frames = [base[:, i * shift : i * shift + w].copy() for i in range(num)]
        system = SLAMSystem(
            SLAMSystemConfig(
                run_id="async", output_root=tmp_path, seed=1, fx=100.0, fy=100.0, cx=80.0, cy=48.0,
                feature=FeaturePipelineConfig(num_features=128, max_matches=64),
                pose=RobustPoseEstimatorConfig(num_hypotheses=64),
                keyframe=KeyframeConfig(min_translation=0.05),
            )
        )
        from mvslam_tpu.runtime.tracking_plane import TrackingControlConfig

        diags = system.run_stream_async(
            packets_from_arrays(frames),
            tracking_control_config=TrackingControlConfig(frame_ttl_s=120.0),
        )
        detail = {
            "diags": [(d.frame_id, d.model_type, d.failure_reason) for d in diags],
            "events": system.store.load_report("control_plane_report")["events"],
        }
        assert len(diags) == 5, detail
        assert diags[0].model_type == "bootstrap", detail
        assert sum(d.pose_success for d in diags[1:]) >= 3
        report = system.store.load_report("control_plane_report")
        assert set(report["snapshots"]) == {"feature", "tracking"}
        assert report["event_digest"]
        result = system.finalize_run()
        assert result.num_frames == 5


class TestProcessPoolIngestion:
    def test_process_pool_decode_ordered(self, tmp_path):
        """The ProcessPoolExecutor boundary (reference's only cross-process
        path) decodes real files in order."""
        from PIL import Image

        rng = np.random.default_rng(0)
        paths = []
        for i in range(10):
            p = tmp_path / f"{i:04d}.png"
            Image.fromarray(
                rng.integers(0, 255, size=(32, 48), dtype=np.uint8), mode="L"
            ).save(p)
            paths.append(p)
        pipeline = AsyncIngestionPipeline(
            paths, config=IngestionPipelineConfig(num_workers=2, use_process_pool=True)
        )
        packets = list(pipeline)
        assert [p.index for p in packets] == list(range(10))
        assert pipeline.failure_report().decoded == 10

    def test_injected_read_fn_rejected_with_process_pool(self):
        with pytest.raises(ValueError, match="read_fn"):
            AsyncIngestionPipeline(
                ["x.png"],
                config=IngestionPipelineConfig(use_process_pool=True),
                read_fn=lambda p: None,
            )


class TestProgramCacheGuard:
    """RSS-bounded jit-cache eviction (docs/KNOWN_ISSUES.md #1): the
    production bound on the XLA:CPU many-program crash mode."""

    def test_disabled_budget_never_evicts(self):
        from mvslam_tpu.runtime.program_budget import ProgramCacheGuard

        guard = ProgramCacheGuard(budget_gb=0.0, check_every=1)
        assert not any(guard.tick() for _ in range(8))
        assert guard.evictions == 0

    def test_under_budget_is_noop(self):
        from mvslam_tpu.runtime.program_budget import ProgramCacheGuard

        guard = ProgramCacheGuard(budget_gb=10_000.0, check_every=1)
        assert not any(guard.tick() for _ in range(8))

    def test_over_budget_evicts_at_cadence(self):
        import jax
        import jax.numpy as jnp

        from mvslam_tpu.runtime.program_budget import ProgramCacheGuard

        # A guard whose budget is below any real process's RSS must evict
        # exactly on the check_every-th tick, and compiled functions must
        # still work (re-trace) afterwards.
        f = jax.jit(lambda x: x * 2.0)
        assert float(f(jnp.float32(3.0))) == 6.0
        guard = ProgramCacheGuard(budget_gb=1e-6, check_every=4)
        ticks = [guard.tick() for _ in range(8)]
        assert ticks == [False, False, False, True, False, False, False, True]
        assert guard.evictions == 2
        assert float(f(jnp.float32(4.0))) == 8.0

    def test_engine_owns_guard(self, tmp_path):
        from mvslam_tpu.slam.api import SLAMSystem, SLAMSystemConfig

        system = SLAMSystem(
            SLAMSystemConfig(
                run_id="guarded", output_root=tmp_path, program_cache_budget_gb=2.5
            )
        )
        assert system.program_guard.budget_gb == 2.5
