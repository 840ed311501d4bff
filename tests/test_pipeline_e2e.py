"""End-to-end pipeline tests on the synthetic city world.

The north-star integration check (SURVEY.md section 4): run the full
prefilter -> odometry -> backend pipeline over a generated sequence with
matching OSM building data, then assert trajectory quality (ATE) and map
output. Small frame counts keep CPU runtime bounded; the full-scale run is
the benchmark's job.
"""

import numpy as np
import pytest

import dataclasses

from delta_graph_slam_tpu.config import get_preset
from delta_graph_slam_tpu.io.kitti import synthetic_city_sequence
from delta_graph_slam_tpu.buildings import StaticProvider
from delta_graph_slam_tpu.pipeline.runner import Pipeline
from delta_graph_slam_tpu.models.prefiltering import PrefilteringConfig
from delta_graph_slam_tpu.register import RegistrationConfig


def rel_gt(frames):
    """Ground truth in the map frame anchored at the first frame (the
    reference harvests gt from tf the same way, delta:172-195)."""
    import jax.numpy as jnp
    from delta_graph_slam_tpu.geom import se2_compose, se2_inverse

    g0 = jnp.asarray(frames[0].gt_pose)
    return [
        np.asarray(se2_compose(se2_inverse(g0), jnp.asarray(fr.gt_pose)))
        for fr in frames
    ]


def small_delta_cfg():
    cfg = get_preset("delta")
    pre = dataclasses.replace(
        cfg.prefiltering, raw_capacity=16384, out_capacity=4096, chunk=1024,
    )
    reg = dataclasses.replace(
        cfg.odometry.registration, chunk=1024, maximum_iterations=30,
    )
    odo = dataclasses.replace(cfg.odometry, registration=reg)
    sm = dataclasses.replace(
        cfg.delta.scanmatcher,
        max_lines=12, max_target_lines=32, edge_capacity=48,
        target_edge_capacity=64, score_chunk=64, n_hypotheses=128,
        cloud_chunk=512, min_cluster_size=20,
    )
    delta = dataclasses.replace(
        cfg.delta, registration=reg, scanmatcher=sm,
        keyframe_delta_trans=1.0, keyframe_delta_angle=1.0,
        graph_update_interval=2.0, compute_ate_rpe=True,
        solver_v_capacity=64, solver_e_capacity=256,
    )
    return dataclasses.replace(cfg, prefiltering=pre, odometry=odo, delta=delta)


@pytest.fixture(scope="module")
def city():
    world, frames = synthetic_city_sequence(n_frames=40, speed=3.0)
    return world, frames


@pytest.mark.slow
class TestDeltaPipelineE2E:
    def test_full_run(self, city, tmp_path_factory):
        world, frames = city
        cfg = small_delta_cfg()
        pipe = Pipeline(cfg, building_provider=StaticProvider(world.osm_xml()),
                        base_T=np.eye(4))
        # GPS first so the backend initializes its origin (reference behavior:
        # keyframes are dropped until the buildings manager exists)
        gts = rel_gt(frames)
        for fr, gt in zip(frames, gts):
            pipe.on_gps(fr.stamp, *fr.gps)
            pipe.on_points(fr.stamp, fr.points, gt_pose=gt)
        pipe.finish()
        backend = pipe.backend

        assert len(backend.keyframes) >= 3
        assert backend.buildings_manager is not None
        assert len(backend.buildings_manager.buildings) >= 3

        # odometry quality: ATE against ground truth (origin-relative)
        metrics = pipe.evaluate()
        assert metrics is not None
        # synthetic world, clean data: demonstrated accuracy is ~1.4 cm
        # (README); bound at 10 cm so a 10x regression still fails loudly
        assert metrics["ATE_mean"] < 0.1, metrics

        # map output
        out = tmp_path_factory.mktemp("maps")
        ok = pipe.save_map(str(out), resolution=0.2)
        assert ok
        assert (out / "map.pcd").exists()
        assert (out / "b_map.pcd").exists()
        assert (out / "aligned_b_map.pcd").exists()

        from delta_graph_slam_tpu.io.pcd import load_pcd

        pts = load_pcd(out / "map.pcd")
        assert len(pts) > 1000

        markers = backend.create_marker_array()
        assert len(markers["keyframe_nodes"]) == len(backend.keyframes)
        assert len(markers["building_nodes"]) >= 3

    def test_graph_has_building_constraints(self, city):
        world, frames = city
        cfg = small_delta_cfg()
        pipe = Pipeline(cfg, building_provider=StaticProvider(world.osm_xml()))
        for fr in frames[:25]:
            pipe.on_gps(fr.stamp, *fr.gps)
            pipe.on_points(fr.stamp, fr.points, gt_pose=fr.gt_pose)
        pipe.finish()
        types = {}
        for e in pipe.backend.graph.edges:
            types[e["type"]] = types.get(e["type"], 0) + 1
        # odometry se2 edges + building priors (xy/yaw at level 1)
        assert types.get("se2", 0) >= 2
        assert types.get("xy", 0) >= 1
        assert types.get("yaw", 0) >= 1


@pytest.mark.slow
class TestHdlPipelineE2E:
    def test_floor_and_gps_run(self, city):
        world, frames = city
        cfg = get_preset("hdl_400")
        pre = dataclasses.replace(
            cfg.prefiltering, raw_capacity=32768, out_capacity=8192, chunk=1024
        )
        reg = dataclasses.replace(
            cfg.odometry.registration, chunk=1024, maximum_iterations=30
        )
        odo = dataclasses.replace(cfg.odometry, registration=reg,
                                  keyframe_delta_trans=1.0)
        floor = dataclasses.replace(
            cfg.floor, sensor_height=1.8, floor_pts_thresh=100,
            capacity=8192, chunk=1024,
        )
        hdl = dataclasses.replace(cfg.hdl, registration=reg,
                                  keyframe_delta_trans=1.0)
        cfg = dataclasses.replace(cfg, prefiltering=pre, odometry=odo,
                                  floor=floor, hdl=hdl)
        pipe = Pipeline(cfg)
        for fr in frames[:20]:
            pipe.on_gps(fr.stamp, *fr.gps)
            pipe.on_points(fr.stamp, fr.points, gt_pose=fr.gt_pose)
        pipe.finish()
        backend = pipe.backend
        assert len(backend.keyframes) >= 3
        # floor edges attached to the shared plane vertex
        etypes = {}
        for e in backend.graph.edges:
            etypes[e["type"]] = etypes.get(e["type"], 0) + 1
        assert etypes.get("se3", 0) >= 3
        assert etypes.get("se3plane", 0) >= 1
        assert backend.floor_plane_node is not None

    def test_imu_preset_gravity_and_orientation_edges(self, city):
        """hdl_imu preset: per-keyframe closest-stamp IMU matching adds
        EdgeSE3PriorQuat + EdgeSE3PriorVec gravity edges (upstream hdl
        imu_callback semantics; SURVEY 2.14) and the graph still solves."""
        world, frames = city
        cfg = get_preset("hdl_imu")
        pre = dataclasses.replace(
            cfg.prefiltering, raw_capacity=32768, out_capacity=8192, chunk=1024
        )
        reg = dataclasses.replace(
            cfg.odometry.registration, chunk=1024, maximum_iterations=30
        )
        odo = dataclasses.replace(cfg.odometry, registration=reg,
                                  keyframe_delta_trans=1.0)
        floor = dataclasses.replace(
            cfg.floor, sensor_height=1.8, floor_pts_thresh=100,
            capacity=8192, chunk=1024,
        )
        hdl = dataclasses.replace(cfg.hdl, registration=reg,
                                  keyframe_delta_trans=1.0)
        cfg = dataclasses.replace(cfg, prefiltering=pre, odometry=odo,
                                  floor=floor, hdl=hdl)
        pipe = Pipeline(cfg)
        for fr in frames[:16]:
            pipe.on_gps(fr.stamp, *fr.gps)
            # level flight: identity orientation, gravity-only specific force
            pipe.on_imu(fr.stamp, [1.0, 0.0, 0.0, 0.0],
                        linear_acceleration=[0.0, 0.0, 9.81])
            pipe.on_points(fr.stamp, fr.points, gt_pose=fr.gt_pose)
        pipe.finish()
        backend = pipe.backend
        assert len(backend.keyframes) >= 3
        etypes = {}
        for e in backend.graph.edges:
            etypes[e["type"]] = etypes.get(e["type"], 0) + 1
        # one orientation + one gravity edge per IMU-matched keyframe
        assert etypes.get("quat", 0) >= 3
        assert etypes.get("vec", 0) >= 3
        # identity-orientation priors on a flat run: solution stays finite
        import numpy as _np

        assert _np.all(_np.isfinite(_np.asarray(backend.poses2d)))


def count_loop_edges(backend):
    """SE2 edges between non-consecutive keyframe nodes = loop closures."""
    kf_nodes = [k.node_id for k in backend.keyframes]
    kf_set = set(kf_nodes)
    consecutive = {
        (kf_nodes[i], kf_nodes[i - 1]) for i in range(1, len(kf_nodes))
    }
    n = 0
    for e in backend.graph.edges:
        if e["type"] != "se2" or e["j"] is None:
            continue
        i, j = int(e["i"]), int(e["j"])
        if i in kf_set and j in kf_set and (i, j) not in consecutive \
                and (j, i) not in consecutive:
            n += 1
    return n


class TestImuDeskewWiring:
    """Pipeline.on_imu feeds the prefilter deskew path: the closest-stamp
    angular velocity is selected per scan (prefiltering_nodelet.cpp:293-354)."""

    def _pipe(self):
        cfg = small_delta_cfg()
        pre = dataclasses.replace(cfg.prefiltering, deskewing=True)
        cfg = dataclasses.replace(cfg, prefiltering=pre)
        return Pipeline(cfg, building_provider=StaticProvider("<osm></osm>"))

    def test_closest_stamp_selection(self):
        pipe = self._pipe()
        pipe.on_imu(0.05, [1, 0, 0, 0], angular_velocity=[0, 0, 0.5])
        pipe.on_imu(0.12, [1, 0, 0, 0], angular_velocity=[0, 0, 1.0])
        av = pipe._closest_imu(0.11)
        assert av is not None and av[2] == pytest.approx(1.0)
        # nothing within 0.2 s -> no deskew
        assert pipe._closest_imu(5.0) is None
        assert pipe._closest_imu(5.0) is None  # queue survives misses

    def test_deskew_changes_output(self, city):
        world, frames = city
        pts = frames[0].points
        pipe = self._pipe()
        out_static = pipe.prefiltering.process(pts)
        out_spun = pipe.prefiltering.process(
            pts, angular_velocity=np.array([0.0, 0.0, 2.0], np.float32)
        )
        a = np.asarray(out_static.filtered3d.points)[
            np.asarray(out_static.filtered3d.mask)
        ]
        b = np.asarray(out_spun.filtered3d.points)[
            np.asarray(out_spun.filtered3d.mask)
        ]
        assert a.shape != b.shape or not np.allclose(a, b, atol=1e-4)


class TestThreadedPipeline:
    """threaded=True overlaps scan processing with the optimizer thread
    (the reference's nodelet-manager concurrency, launch:23 + delta:793)."""

    @pytest.mark.slow
    def test_threaded_matches_serial_contract(self, city):
        world, frames = city
        cfg = small_delta_cfg()
        pipe = Pipeline(
            cfg, building_provider=StaticProvider(world.osm_xml()),
            threaded=True,
        )
        gts = rel_gt(frames)
        for fr, gt in zip(frames, gts):
            pipe.on_gps(fr.stamp, *fr.gps)
            assert pipe.on_points(fr.stamp, fr.points, gt_pose=gt) is None
        pipe.finish()
        backend = pipe.backend
        assert len(backend.keyframes) >= 3
        m = pipe.evaluate()
        assert m is not None and m["ATE_mean"] < 0.1, m

    def test_worker_error_propagates(self):
        cfg = small_delta_cfg()
        pipe = Pipeline(cfg, building_provider=StaticProvider("<osm></osm>"),
                        threaded=True)
        pipe.on_gps(0.0, 49.0, 8.4)
        pipe.on_points(0.0, "not an array")  # breaks inside the worker
        import time as _t

        for _ in range(100):
            if pipe._worker_error is not None:
                break
            _t.sleep(0.05)
        with pytest.raises(Exception):
            pipe.finish()


class TestLoopClosure:
    """Exercises the LoopDetector end-to-end: the 'lap' trajectory drives
    out, u-turns and returns along the street, so returning keyframes pass
    the distance/accum-distance gates (loop_detector.hpp:83-111) and the
    scan-match validation adds loop edges (delta:816-824)."""

    @pytest.mark.slow
    def test_lap_closes_loops(self, tmp_path_factory):
        # 20-frame u-turn: ~0.16 rad/frame, inside the registration's
        # measured convergence basin (~0.2 rad) under the constant-
        # velocity prior; the return leg passes ~3.8 m from the outbound
        # keyframes
        world, frames = synthetic_city_sequence(
            n_frames=52, speed=3.0, trajectory="lap", turn_frames=20,
        )
        cfg = small_delta_cfg()
        delta = dataclasses.replace(
            cfg.delta, distance_thresh=6.0, accum_distance_thresh=6.0,
            min_edge_interval=3.0, fitness_score_thresh=1.0,
        )
        cfg = dataclasses.replace(cfg, delta=delta)
        pipe = Pipeline(cfg, building_provider=StaticProvider(world.osm_xml()))
        gts = rel_gt(frames)
        for fr, gt in zip(frames, gts):
            pipe.on_gps(fr.stamp, *fr.gps)
            pipe.on_points(fr.stamp, fr.points, gt_pose=gt)
        pipe.finish()
        backend = pipe.backend
        assert count_loop_edges(backend) >= 1
        assert backend.loop_detector.last_edge_accum_distance > 0.0
        m = pipe.evaluate()
        assert m is not None and m["ATE_mean"] < 0.5, m

    @pytest.mark.slow
    def test_loop_closure_improves_ate(self):
        # slow: ~1 min of XLA-CPU compiles; the fast gate keeps loop
        # gating covered via test_loop_detector and the lap e2e runs in
        # the nightly slow suite.
        """Controlled drift: feed the backend keyframe odometry with an
        injected random-walk bias; the run with loop closure enabled must
        beat the run without it on final ATE."""
        from delta_graph_slam_tpu.models.prefiltering import PrefilteringStage

        world, frames = synthetic_city_sequence(
            n_frames=52, speed=3.0, trajectory="lap", turn_frames=20,
        )
        gts = rel_gt(frames)
        cfg = small_delta_cfg()
        pre = PrefilteringStage(cfg.prefiltering)

        def run(enable_loops):
            from delta_graph_slam_tpu.models.delta_backend import DeltaBackend
            from delta_graph_slam_tpu.geom.host import (
                se2_compose_np, se2_inverse_np, transform_2d_to_3d_np,
            )

            delta = dataclasses.replace(
                cfg.delta, distance_thresh=6.0, accum_distance_thresh=6.0,
                min_edge_interval=3.0 if enable_loops else 1e18,
                fitness_score_thresh=1.0, compute_ate_rpe=True,
                enable_buildings=False,
            )
            backend = DeltaBackend(delta, StaticProvider("<osm></osm>"))
            rng = np.random.default_rng(3)
            drift = np.zeros(3)
            last_opt = frames[0].stamp
            for fr, gt in zip(frames, gts):
                backend.gps_callback(fr.stamp, *fr.gps)
                out = pre.process(fr.points)
                # odometry = gt composed with an accumulated drift bias
                drift = drift + np.array([
                    rng.normal(0.004, 0.004), rng.normal(0.006, 0.004),
                    rng.normal(0.0015, 0.001),
                ])
                odom2d = se2_compose_np(gt, drift)
                backend.cloud_callback(
                    fr.stamp, transform_2d_to_3d_np(odom2d),
                    out.filtered3d, out.filtered2d, gt_pose=gt,
                )
                if fr.stamp - last_opt >= delta.graph_update_interval:
                    backend.optimization_step()
                    last_opt = fr.stamp
            backend.optimization_step()
            m = backend.compute_ate_rpe()
            return backend, m

        b_loop, m_loop = run(True)
        b_none, m_none = run(False)
        assert count_loop_edges(b_loop) >= 1
        assert count_loop_edges(b_none) == 0
        assert m_loop["ATE_mean"] < m_none["ATE_mean"], (m_loop, m_none)


@pytest.mark.slow
class TestCheckpointResume:
    def test_save_load_state(self, city, tmp_path_factory):
        world, frames = city
        cfg = small_delta_cfg()
        from delta_graph_slam_tpu.buildings import StaticProvider

        pipe = Pipeline(cfg, building_provider=StaticProvider(world.osm_xml()))
        gts = rel_gt(frames)
        half = len(frames) // 2
        for fr, gt in zip(frames[:half], gts[:half]):
            pipe.on_gps(fr.stamp, *fr.gps)
            pipe.on_points(fr.stamp, fr.points, gt_pose=gt)
        pipe.finish()
        b1 = pipe.backend
        out = tmp_path_factory.mktemp("ckpt")
        path = str(out / "state.npz")
        pipe.save_state(path)

        # fresh pipeline resumes (backend + odometry stage) and continues
        pipe2 = Pipeline(cfg, building_provider=StaticProvider(world.osm_xml()))
        pipe2.load_state(path, cloud_capacity=16384, flat_capacity=4096)
        b2 = pipe2.backend
        assert len(b2.keyframes) == len(b1.keyframes)
        np.testing.assert_allclose(b2.poses[: len(b1.poses)], b1.poses,
                                   atol=1e-6)
        assert len(b2.buildings_manager.buildings) == len(
            b1.buildings_manager.buildings
        )
        # continue processing on the restored backend
        b2.scale = b1.scale
        b2.origin = b1.origin
        for fr, gt in zip(frames[half:], gts[half:]):
            pipe2.on_points(fr.stamp, fr.points, gt_pose=gt)
        pipe2.finish()
        assert len(pipe2.backend.keyframes) > len(b1.keyframes)
        m = pipe2.evaluate()
        assert m is not None and m["ATE_mean"] < 2.0, m


@pytest.mark.slow
class TestRaycastDeltaE2E:
    """Full delta pipeline on raycast lidar geometry (io/lidar_sim.py):
    occluded 64-beam-style scans with range noise and dropout — the
    honest stand-in for real velodyne bags (VERDICT r2 #4; the
    point-soup sampler has no occlusion or beam structure and flatters
    registration convergence). A reduced beam model keeps the scans
    inside the small test capacities."""

    def _raycast_city(self, n_frames, trajectory="forward", turn_frames=None):
        from delta_graph_slam_tpu.io.lidar_sim import (
            LidarModel, raycast_city_sequence,
        )

        model = LidarModel(n_beams=32, azimuth_step_deg=1.0, dropout=0.05)
        return raycast_city_sequence(
            n_frames=n_frames, speed=3.0, model=model,
            trajectory=trajectory, turn_frames=turn_frames,
        )

    def test_raycast_full_run(self):
        world, frames = self._raycast_city(40)
        cfg = small_delta_cfg()
        pipe = Pipeline(cfg, building_provider=StaticProvider(world.osm_xml()),
                        base_T=np.eye(4))
        gts = rel_gt(frames)
        for fr, gt in zip(frames, gts):
            pipe.on_gps(fr.stamp, *fr.gps)
            pipe.on_points(fr.stamp, fr.points, gt_pose=gt)
        pipe.finish()
        backend = pipe.backend
        assert len(backend.keyframes) >= 3
        assert len(backend.buildings_manager.buildings) >= 3
        metrics = pipe.evaluate()
        assert metrics is not None
        # occluded beam-structured scans with noise: accuracy degrades
        # vs the point soup (cm-level) — bound at 1 m to catch gross
        # registration/backend regressions without overfitting the sim
        assert metrics["ATE_mean"] < 1.0, metrics

    def test_raycast_lap_closes_loops(self):
        world, frames = self._raycast_city(52, trajectory="lap",
                                           turn_frames=20)
        cfg = small_delta_cfg()
        delta = dataclasses.replace(
            cfg.delta, distance_thresh=6.0, accum_distance_thresh=6.0,
            min_edge_interval=3.0, fitness_score_thresh=1.0,
        )
        cfg = dataclasses.replace(cfg, delta=delta)
        pipe = Pipeline(cfg, building_provider=StaticProvider(world.osm_xml()))
        gts = rel_gt(frames)
        for fr, gt in zip(frames, gts):
            pipe.on_gps(fr.stamp, *fr.gps)
            pipe.on_points(fr.stamp, fr.points, gt_pose=gt)
        pipe.finish()
        backend = pipe.backend
        assert count_loop_edges(backend) >= 1
        m = pipe.evaluate()
        assert m is not None and m["ATE_mean"] < 1.5, m
