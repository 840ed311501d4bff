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
    )
    return dataclasses.replace(cfg, prefiltering=pre, odometry=odo, delta=delta)


@pytest.fixture(scope="module")
def city():
    world, frames = synthetic_city_sequence(n_frames=40, speed=3.0)
    return world, frames


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
        # synthetic world, clean data: trajectory within a meter
        assert metrics["ATE_mean"] < 1.0, metrics

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
