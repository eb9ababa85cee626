"""Evaluation stack tests (reference parity: tests/test_evaluation_harness.py,
tests/test_benchmark_regression_gate.py, tests/test_benchmark_ci_runner.py,
tests/test_determinism_validation.py)."""

import asyncio
import json
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.smoke  # <5-min dev-loop tier (VERDICT r3 item 7)

from mvslam_tpu.eval.baselines import BaselineStore, MetricThreshold, compare_metrics
from mvslam_tpu.eval.ci_runner import SeverityWeights, metric_severity, score_run
from mvslam_tpu.eval.determinism_validation import (
    build_determinism_report,
    build_run_digest,
)
from mvslam_tpu.eval.governance import (
    BenchmarkSpec,
    load_governance_config,
    run_benchmark,
    run_governance,
)
from mvslam_tpu.eval.harness import load_config, run_evaluation
from mvslam_tpu.eval.readiness import generate_readiness_report
from mvslam_tpu.eval.regression_gate import execute_gate
from mvslam_tpu.eval.relocalization_metrics import (
    summarize_relocalization_events,
    summarize_relocalized_frames,
)
from mvslam_tpu.eval.telemetry_intelligence import (
    AbsoluteIncreasePolicy,
    RelativeIncreasePolicy,
    TelemetryDriftEvaluator,
    flatten_stage_metrics,
    summarize_telemetry_streaming,
)
from mvslam_tpu.eval.trajectory import (
    compute_additional_metrics,
    compute_ate,
    compute_rpe,
    load_trajectory_file,
)


def write_kitti_trajectory(path: Path, positions):
    lines = []
    for p in positions:
        T = np.eye(4)
        T[:3, 3] = p
        lines.append(" ".join(f"{v:.9f}" for v in T[:3, :].reshape(-1)))
    path.write_text("\n".join(lines))


class TestTrajectoryMetrics:
    def test_identical_trajectories_zero_error(self, tmp_path):
        pts = np.cumsum(np.random.default_rng(0).normal(size=(50, 3)), axis=0)
        assert compute_ate(pts, pts) < 1e-9
        assert compute_rpe(pts, pts) < 1e-9

    def test_scale_invariance_via_alignment(self):
        rng = np.random.default_rng(1)
        gt = np.cumsum(rng.normal(size=(40, 3)), axis=0)
        est = gt * 3.7  # monocular scale ambiguity
        assert compute_ate(est, gt) < 1e-6

    def test_additional_metrics_keys(self):
        rng = np.random.default_rng(2)
        gt = np.cumsum(rng.normal(size=(30, 3)), axis=0)
        est = gt + rng.normal(scale=0.05, size=gt.shape)
        m = compute_additional_metrics(est, gt)
        assert set(m) == {"ATE_RMSE", "ATE_MEAN", "ATE_MEDIAN", "RPE_RMSE", "RPE_MEAN", "RPE_MEDIAN"}
        assert 0 < m["ATE_RMSE"] < 0.2
        assert m["ATE_MEDIAN"] <= m["ATE_RMSE"] * 2

    def test_kitti_format_loading(self, tmp_path):
        pts = np.asarray([[0, 0, 0], [1.0, 0.5, 2.0]])
        path = tmp_path / "traj.txt"
        write_kitti_trajectory(path, pts)
        loaded = load_trajectory_file(path, "kitti_odom")
        assert np.allclose(loaded, pts)

    def test_unknown_format_raises(self, tmp_path):
        with pytest.raises(ValueError):
            load_trajectory_file(tmp_path / "x.txt", "bogus")


class TestBaselines:
    def test_direction_lower_with_tolerance(self):
        thresholds = {"ATE_RMSE": MetricThreshold(direction="lower", tolerance=0.05)}
        report = compare_metrics({"ATE_RMSE": 1.04}, {"ATE_RMSE": 1.0}, thresholds)
        assert report.status == "pass"
        report = compare_metrics({"ATE_RMSE": 1.10}, {"ATE_RMSE": 1.0}, thresholds)
        assert report.status == "regressed"

    def test_missing_baseline(self):
        thresholds = {"x": MetricThreshold(max_delta=1.0)}
        report = compare_metrics({"x": 1.0}, None, thresholds)
        assert report.status == "missing_baseline"

    def test_store_roundtrip(self, tmp_path):
        store = BaselineStore(tmp_path / "b.json")
        assert store.load_baseline("k") is None
        store.upsert_baseline("k", {"ATE_RMSE": 0.5}, config_hash="abc")
        assert store.load_baseline("k") == {"ATE_RMSE": 0.5}
        assert store.keys() == ["k"]


class TestTelemetryIntelligence:
    def _events(self):
        return [
            {"name": "feature_detect", "duration_s": 0.01, "timestamp_s": 1.0, "metadata": {"success": True}},
            {"name": "feature_detect", "duration_s": 0.02, "timestamp_s": 2.0, "metadata": {"success": True, "memory_delta_bytes": 100}},
            {"name": "pose_estimate", "duration_s": 0.05, "timestamp_s": 3.0, "metadata": {"success": False, "error": "x"}},
        ]

    def test_streaming_summary(self, tmp_path):
        path = tmp_path / "events.json"
        path.write_text(json.dumps(self._events()))
        summary = summarize_telemetry_streaming(path)
        assert summary["total_events"] == 3
        assert summary["stages"]["feature_detect"]["duration_s"]["count"] == 2
        assert summary["stages"]["pose_estimate"]["errors"] == 1

    def test_flatten(self, tmp_path):
        path = tmp_path / "e.json"
        path.write_text(json.dumps(self._events()))
        flat = flatten_stage_metrics(summarize_telemetry_streaming(path))
        assert flat["telemetry_stage_feature_detect_duration_count"] == 2
        assert flat["telemetry_stage_pose_estimate_errors"] == 1

    def test_drift_policies(self):
        rel = RelativeIncreasePolicy(warn_ratio=0.2, fail_ratio=0.5)
        assert rel.evaluate("m", 1.1, 1.0).status == "pass"
        assert rel.evaluate("m", 1.3, 1.0).status == "warn"
        assert rel.evaluate("m", 1.6, 1.0).status == "fail"
        ab = AbsoluteIncreasePolicy(warn_delta=0.1, fail_delta=0.5)
        assert ab.evaluate("m", 1.05, 1.0).status == "pass"
        assert ab.evaluate("m", 1.2, 1.0).status == "warn"
        assert ab.evaluate("m", 2.0, 1.0).status == "fail"

    def test_drift_evaluator(self):
        ev = TelemetryDriftEvaluator(RelativeIncreasePolicy(0.2, 0.5))
        report = ev.evaluate({"a": 2.0, "b": 1.0}, {"a": 1.0, "b": 1.0})
        assert report.status == "fail"
        assert {v.metric for v in report.verdicts} == {"a", "b"}


class TestDeterminismValidation:
    def test_identical_runs_pass(self, tmp_path):
        for name in ("a", "b"):
            d = tmp_path / name
            (d / "trajectories").mkdir(parents=True)
            np.savez(d / "trajectories" / "est.npz", poses=np.eye(4)[None])
            (d / "metrics.json").write_text(json.dumps({"x": 1, "recorded_at": name}))
        report = build_determinism_report(tmp_path / "a", tmp_path / "b")
        assert report.passed, report.to_dict()

    def test_drift_detected(self, tmp_path):
        for name, val in (("a", 1.0), ("b", 2.0)):
            d = tmp_path / name
            (d / "trajectories").mkdir(parents=True)
            np.savez(d / "trajectories" / "est.npz", poses=np.eye(4)[None] * val)
        report = build_determinism_report(tmp_path / "a", tmp_path / "b")
        assert not report.passed
        assert "trajectories/est.npz" in report.mismatched

    def test_timestamps_excluded(self, tmp_path):
        digests = []
        for ts in (1.0, 99.0):
            d = tmp_path / f"r{ts}"
            d.mkdir()
            (d / "telemetry.json").write_text(
                json.dumps([{"name": "s", "duration_s": ts, "timestamp_s": ts}])
            )
            digests.append(build_run_digest(d))
        assert digests[0]["telemetry.json"] == digests[1]["telemetry.json"]


class TestRelocalizationMetrics:
    def test_event_summary(self):
        events = [
            {"name": "relocalization_search", "duration_s": 0.1, "metadata": {"success": True}},
            {"name": "relocalization_search", "duration_s": 0.2, "metadata": {"success": False}},
            {"name": "other", "duration_s": 0.3, "metadata": {}},
        ]
        s = summarize_relocalization_events(events)
        assert s["attempts"] == 2
        assert s["successes"] == 1
        assert s["success_rate"] == 0.5

    def test_frame_summary(self):
        diags = [
            {"frame_id": 0, "pose_success": True},
            {"frame_id": 1, "pose_success": False},
            {"frame_id": 1, "relocalized": True, "pose_success": False, "num_matches": 50, "num_inliers": 30},
        ]
        s = summarize_relocalized_frames(diags)
        assert s["relocalizations"] == 1
        assert s["inliers_p50"] == 30


def make_eval_setup(tmp_path, with_baseline=False, write=False):
    """Synthetic gt/est trajectories + a harness config JSON."""
    rng = np.random.default_rng(0)
    gt = np.cumsum(rng.normal(size=(40, 3)), axis=0)
    est = gt + rng.normal(scale=0.02, size=gt.shape)
    write_kitti_trajectory(tmp_path / "gt.txt", gt)
    write_kitti_trajectory(tmp_path / "est.txt", est)
    config = {
        "run": {"run_id": "eval_test", "output_root": str(tmp_path / "runs"), "seed": 3},
        "evaluation": {
            "rpe_delta": 1,
            "trajectories": [{"name": "seq0", "gt": "gt.txt", "est": "est.txt"}],
        },
    }
    if with_baseline:
        config["baseline"] = {
            "store": "baselines.json",
            "key": "seq_key",
            "metric_thresholds": {"ATE_RMSE": {"direction": "lower", "tolerance": 0.05}},
            "write": write,
        }
    path = tmp_path / "config.json"
    path.write_text(json.dumps(config))
    return path


class TestHarness:
    def test_end_to_end(self, tmp_path):
        cfg_path = make_eval_setup(tmp_path)
        summary = run_evaluation(load_config(cfg_path))
        assert summary["status"] == "pass"
        assert "ATE_RMSE" in summary["aggregate"]
        run_dir = Path(summary["run_dir"])
        assert (run_dir / "summary.json").exists()
        assert (run_dir / "summary.csv").exists()
        # Per-sequence report files (parity: evaluation_harness.py:561-564).
        for ext in ("txt", "json", "csv"):
            assert (run_dir / "sequences" / f"seq0.{ext}").exists()
        seq_metrics = json.loads((run_dir / "sequences" / "seq0.json").read_text())
        assert seq_metrics["ATE_RMSE"] == pytest.approx(
            summary["sequences"]["seq0"]["metrics"]["ATE_RMSE"]
        )

    def test_baseline_flow(self, tmp_path):
        cfg_path = make_eval_setup(tmp_path, with_baseline=True, write=True)
        s1 = run_evaluation(load_config(cfg_path))
        assert s1["status"] == "missing_baseline"  # first run writes
        s2 = run_evaluation(load_config(cfg_path))
        assert s2["status"] == "pass"
        assert s2["baseline_comparisons"]["metrics"]["status"] == "pass"

    def test_run_dir_entry(self, tmp_path):
        """Harness can evaluate a SLAM run directory's npz trajectory."""
        from mvslam_tpu.core.persistence import RunDataStore, TrajectoryAccumulator

        rng = np.random.default_rng(1)
        gt = np.cumsum(rng.normal(size=(10, 3)), axis=0)
        store = RunDataStore(tmp_path / "slam_run")
        acc = TrajectoryAccumulator()
        for i, p in enumerate(gt):
            T = np.eye(4)
            T[:3, 3] = p
            acc.append(i, 0.1 * i, T)
        store.save_trajectory("estimated", acc)
        write_kitti_trajectory(tmp_path / "gt.txt", gt)
        cfg = {
            "run": {"run_id": "rd", "output_root": str(tmp_path / "runs")},
            "evaluation": {
                "trajectories": [
                    {"name": "s", "gt": "gt.txt", "est_run_dir": "slam_run"}
                ]
            },
        }
        p = tmp_path / "cfg.json"
        p.write_text(json.dumps(cfg))
        summary = run_evaluation(load_config(p))
        assert summary["aggregate"]["ATE_RMSE"] < 1e-6


class TestGateAndCI:
    def test_gate_pass_and_failfast(self, tmp_path):
        (tmp_path / "g").mkdir(exist_ok=True)
        good = make_eval_setup(tmp_path / "g")
        summary = asyncio.run(execute_gate([good], max_concurrency=1))
        assert summary["status"] == "pass"
        bad = tmp_path / "bad.json"
        bad.write_text("{invalid")
        summary = asyncio.run(execute_gate([bad, good], max_concurrency=1))
        assert summary["status"] == "error"

    def test_severity(self):
        weights = SeverityWeights()
        comp = {"metric": "ATE_RMSE", "status": "regressed", "current": 1.5, "baseline": 1.0}
        assert metric_severity(comp, weights) == pytest.approx(1.0)  # 2.0 * 0.5
        assert metric_severity({**comp, "status": "pass"}, weights) == 0.0
        run_detail = {"baseline_comparisons": {"metrics": {"comparisons": [comp]}}}
        assert score_run(run_detail, weights) == pytest.approx(1.0)


class TestGovernance:
    def test_run_benchmark_pass(self):
        spec = BenchmarkSpec(
            name="echo",
            command=["python", "-c", "import json; print(json.dumps({'metric': 'm', 'value': 1.0}))"],
        )
        result = run_benchmark(spec)
        assert result["status"] == "pass"
        assert result["metrics"] == {"m": 1.0}

    def test_budget_exceeded(self):
        spec = BenchmarkSpec(
            name="sleepy", command=["python", "-c", "import time; time.sleep(2)"], runtime_budget_s=0.3
        )
        result = run_benchmark(spec)
        assert result["status"] == "budget_exceeded"

    def test_governance_config_and_run(self, tmp_path):
        cfg = tmp_path / "gov.json"
        cfg.write_text(
            json.dumps(
                {
                    "benchmarks": [
                        {
                            "name": "ok",
                            "command": ["python", "-c", "print('{\"metric\": \"v\", \"value\": 2}')"],
                        }
                    ],
                    "fail_fast": True,
                }
            )
        )
        config = load_governance_config(cfg)
        summary = run_governance(config)
        assert summary["status"] == "pass"
        assert summary["benchmarks"][0]["metrics"]["v"] == 2.0


class TestPerfGate:
    """The repo's own perf, gated by the repo's own gates (VERDICT r3 item 4):
    the committed perf_gate.json + baselines/perf_tpu.json must trip on a
    deliberate slowdown of the hottest stage."""

    REPO = Path(__file__).resolve().parents[1]

    def _committed(self):
        cfg = load_governance_config(self.REPO / "configs/evaluation/perf_gate.json")
        store = BaselineStore(self.REPO / "baselines/perf_tpu.json")
        return cfg, store

    def test_committed_config_covers_baselines(self):
        """Every thresholded metric has a committed baseline value — a gate
        that would report missing_baseline is a gate that never trips."""
        cfg, store = self._committed()
        assert cfg["baseline_store"] == "baselines/perf_tpu.json"
        for spec in cfg["specs"]:
            baseline = store.load_baseline(spec.name)
            assert baseline is not None, f"no baseline entry for {spec.name}"
            for metric in spec.metric_thresholds:
                assert metric in baseline, f"{spec.name}: no baseline for {metric}"

    def test_2x_ransac_slowdown_trips_gate(self, tmp_path):
        """Simulate the round-3 failure mode: dual-model RANSAC at 2x its
        committed ms. Uses the COMMITTED thresholds + baseline store with a
        stub benchmark (no TPU needed) — the gate semantics are what's under
        test. Ref contract: ``benchmark_governance.py:112-156``."""
        cfg, store = self._committed()
        spec = next(s for s in cfg["specs"] if s.name == "roofline_tpu")
        baseline = store.load_baseline("roofline_tpu")
        slowed = {m: v * (2.0 if "ransac" in m else 1.0) for m, v in baseline.items()}
        emit_lines = "; ".join(
            f"print(__import__('json').dumps({{'metric': '{m}', 'value': {v}}}))"
            for m, v in slowed.items()
        )
        stub_cfg = {
            "specs": [
                BenchmarkSpec(
                    name="roofline_tpu",
                    command=["python", "-c", emit_lines],
                    metric_thresholds=spec.metric_thresholds,
                )
            ],
            "baseline_store": str(self.REPO / "baselines/perf_tpu.json"),
            "fail_fast": False,
            "write_baseline": False,
        }
        summary = run_governance(stub_cfg)
        assert summary["status"] == "regressed"
        comp = summary["benchmarks"][0]["baseline_comparison"]
        regressed = [c for c in comp["comparisons"] if c["status"] == "regressed"]
        assert [c["metric"] for c in regressed] == ["roofline_ransac_dual_model_ms"]

    def test_within_tolerance_passes(self, tmp_path):
        cfg, store = self._committed()
        spec = next(s for s in cfg["specs"] if s.name == "roofline_tpu")
        baseline = store.load_baseline("roofline_tpu")
        jittered = {m: v * 1.1 for m, v in baseline.items()}  # inside 20% tol
        emit_lines = "; ".join(
            f"print(__import__('json').dumps({{'metric': '{m}', 'value': {v}}}))"
            for m, v in jittered.items()
        )
        stub_cfg = {
            "specs": [
                BenchmarkSpec(
                    name="roofline_tpu",
                    command=["python", "-c", emit_lines],
                    metric_thresholds=spec.metric_thresholds,
                )
            ],
            "baseline_store": str(self.REPO / "baselines/perf_tpu.json"),
            "fail_fast": False,
        }
        assert run_governance(stub_cfg)["status"] == "pass"

    def test_ci_runner_merges_perf_gate(self, tmp_path):
        """A perf regression flips the CI suite verdict (the wiring half of
        r3 item 4)."""
        from mvslam_tpu.eval.ci_runner import run_ci_suite

        store_path = tmp_path / "store.json"
        BaselineStore(store_path).upsert_baseline("b", {"stage_ms": 1.0})
        gov_cfg = tmp_path / "gov.json"
        gov_cfg.write_text(
            json.dumps(
                {
                    "benchmarks": [
                        {
                            "name": "b",
                            "command": [
                                "python",
                                "-c",
                                "print('{\"metric\": \"stage_ms\", \"value\": 2.0}')",
                            ],
                            "metric_thresholds": {
                                "stage_ms": {"direction": "lower", "tolerance": 0.15}
                            },
                        }
                    ],
                    "baseline_store": str(store_path),
                }
            )
        )
        summary = asyncio.run(run_ci_suite([], governance_config=gov_cfg))
        assert summary["status"] == "regressed"
        assert summary["perf_gate"]["benchmarks"][0]["status"] == "regressed"
        assert summary["total_severity"] > 0.0


class TestAccuracyGate:
    """Accuracy gated like perf (VERDICT r4 #2): the committed
    accuracy_gate.json + baselines/accuracy_scenes.json must trip on an
    ab04a4b-shaped regression — loop closure that makes ATE worse instead
    of better, plus per-scene ATE blow-ups."""

    REPO = Path(__file__).resolve().parents[1]

    def _committed(self):
        cfg = load_governance_config(self.REPO / "configs/evaluation/accuracy_gate.json")
        store = BaselineStore(self.REPO / "baselines/accuracy_scenes.json")
        return cfg, store

    def test_committed_config_covers_baselines(self):
        cfg, store = self._committed()
        assert cfg["baseline_store"] == "baselines/accuracy_scenes.json"
        baseline = store.load_baseline("accuracy_scenes")
        assert baseline is not None
        for spec in cfg["specs"]:
            for metric in spec.metric_thresholds:
                assert metric in baseline, f"no baseline for {metric}"

    def test_loop_ratio_limit_is_below_one(self):
        """The loop ATE-ratio threshold must enforce the reference's loop
        contract (accepted loops HELP, ratio < 1): baseline*(1+tol) < 1."""
        cfg, store = self._committed()
        spec = next(s for s in cfg["specs"] if s.name == "accuracy_scenes")
        base = store.load_baseline("accuracy_scenes")["accuracy_oab_loop_ate_ratio"]
        tol = spec.metric_thresholds["accuracy_oab_loop_ate_ratio"].tolerance
        assert base * (1.0 + tol) < 1.0

    def _stub_summary(self, degrade):
        cfg, store = self._committed()
        spec = next(s for s in cfg["specs"] if s.name == "accuracy_scenes")
        baseline = store.load_baseline("accuracy_scenes")
        metrics = {m: degrade(m, v) for m, v in baseline.items()}
        emit_lines = "; ".join(
            f"print(__import__('json').dumps({{'metric': '{m}', 'value': {v}}}))"
            for m, v in metrics.items()
        )
        stub_cfg = {
            "specs": [
                BenchmarkSpec(
                    name="accuracy_scenes",
                    command=["python", "-c", emit_lines],
                    metric_thresholds=spec.metric_thresholds,
                )
            ],
            "baseline_store": str(self.REPO / "baselines/accuracy_scenes.json"),
            "fail_fast": False,
            "write_baseline": False,
        }
        return run_governance(stub_cfg)

    def test_ab04a4b_shaped_regression_trips_gate(self):
        """Replay round 4's shipped regression: per-scene ATE ~2.9x and the
        loop ratio at its measured regressed value (1.16 — loops hurting)."""

        def degrade(metric, value):
            if metric == "accuracy_oab_loop_ate_ratio":
                return 1.16
            return value * 2.9

        summary = self._stub_summary(degrade)
        assert summary["status"] == "regressed"
        comp = summary["benchmarks"][0]["baseline_comparison"]
        regressed = {c["metric"] for c in comp["comparisons"] if c["status"] == "regressed"}
        assert "accuracy_oab_loop_ate_ratio" in regressed
        assert "accuracy_mean_ate_rmse" in regressed

    def test_cross_env_drift_passes(self):
        """Numeric drift between XLA:CPU compile environments (measured
        ~1.5x worst-case on the out-and-back scene this round) must NOT
        trip the gate — only regression-sized moves should."""
        summary = self._stub_summary(
            lambda m, v: v * (1.0 if m == "accuracy_oab_loop_ate_ratio" else 1.45)
        )
        assert summary["status"] == "pass"


class TestReadiness:
    def test_rollup(self):
        report = generate_readiness_report(
            control_plane_report={"stages": {"ingestion": {"state": "healthy"}, "feature": {"state": "degraded"}}},
            evaluation_summary={"status": "pass", "aggregate": {"ATE_RMSE": 0.1}},
            telemetry_summary={"total_events": 10, "stages": {"s": {"errors": 0}}},
        )
        assert report["sections"]["control_plane"]["status"] == "warn"
        assert report["sections"]["evaluation"]["status"] == "pass"
        assert report["status"] == "warn"
        assert report["digest"]

    def test_unknown_sections(self):
        report = generate_readiness_report()
        assert report["status"] == "unknown"


class TestIntrinsicsEstimation:
    def test_focal_from_vanishing_points(self):
        import numpy as np
        from mvslam_tpu.frontend.intrinsics import (
            estimate_focal_from_line_pairs,
            estimate_focal_from_vanishing_points,
        )

        f, c = 500.0, np.array([320.0, 240.0])
        # Two orthogonal directions d1, d2 → vanishing points c + f * (dx/dz, dy/dz)
        d1 = np.array([1.0, 0.0, 0.5]); d1 /= np.linalg.norm(d1)
        d2 = np.array([-0.5, 0.0, 1.0]); d2 /= np.linalg.norm(d2)
        assert abs(d1 @ d2) < 1e-9
        v1 = c + f * d1[:2] / d1[2]
        v2 = c + f * d2[:2] / d2[2]
        est = estimate_focal_from_vanishing_points(v1, v2, c)
        assert est == pytest.approx(f, rel=1e-6)
        # From line segments converging at those vanishing points:
        def family(v):
            segs = []
            for start in ([0.0, 0.0], [100.0, 300.0], [50.0, 400.0]):
                p1 = np.asarray(start)
                direction = v - p1
                segs.append((p1, p1 + 0.3 * direction))
            return segs

        est2 = estimate_focal_from_line_pairs(family(v1), family(v2), c)
        assert est2 == pytest.approx(f, rel=1e-3)

    def test_degenerate_returns_none(self):
        import numpy as np
        from mvslam_tpu.frontend.intrinsics import estimate_focal_from_vanishing_points

        c = np.array([0.0, 0.0])
        assert estimate_focal_from_vanishing_points([1.0, 0.0], [2.0, 0.0], c) is None
