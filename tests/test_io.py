"""io layer tests: NMEA, PCD, bag replay + watermark, tf table, graph io."""

import numpy as np
import pytest

from delta_graph_slam_tpu.io import (
    Bag, BagPlayer, Message, NmeaSentenceParser, TransformTable,
    load_pcd, save_pcd,
)
from delta_graph_slam_tpu.io.nmea import degmin2deg
from delta_graph_slam_tpu.pipeline.flow import BoundedQueue, Watermark

RNG = np.random.default_rng(1)


def nmea_with_checksum(body):
    x = 0
    for ch in body:
        x ^= ord(ch)
    return f"${body}*{x:02X}"


class TestNmea:
    def test_parse_valid_gprmc(self):
        body = "GPRMC,123519,A,4807.038,N,01131.000,E,022.4,084.4,230394,003.1,W"
        s = nmea_with_checksum(body)
        p = NmeaSentenceParser()
        out = p.parse(s)
        assert out.valid
        np.testing.assert_allclose(out.latitude, 48 + 7.038 / 60, atol=1e-9)
        np.testing.assert_allclose(out.longitude, 11 + 31.0 / 60, atol=1e-9)

    def test_bad_checksum_rejected(self):
        s = "$GPRMC,123519,A,4807.038,N,01131.000,E,022.4,084.4,230394,003.1,W*00"
        assert not NmeaSentenceParser().parse(s).valid

    def test_void_status_rejected(self):
        body = "GPRMC,123519,V,4807.038,N,01131.000,E,022.4,084.4,230394,003.1,W"
        assert not NmeaSentenceParser().parse(nmea_with_checksum(body)).valid

    def test_degmin(self):
        np.testing.assert_allclose(degmin2deg(4807.038), 48.1173, atol=1e-4)


class TestPcd:
    @pytest.mark.parametrize("binary", [True, False])
    def test_roundtrip(self, tmp_path, binary):
        pts = RNG.uniform(-5, 5, (100, 3)).astype(np.float32)
        path = tmp_path / "t.pcd"
        save_pcd(path, pts, binary=binary)
        back = load_pcd(path)
        np.testing.assert_allclose(back, pts, atol=1e-5)


class TestBag:
    def test_npz_roundtrip(self, tmp_path):
        msgs = [
            Message(0.1, "points", RNG.uniform(-1, 1, (50, 3))),
            Message(0.2, "gps", np.array([49.0, 8.4])),
            Message(0.3, "points", RNG.uniform(-1, 1, (60, 3))),
        ]
        bag = Bag(msgs)
        p = tmp_path / "b.npz"
        bag.save_npz(p)
        back = Bag.from_npz(p)
        assert len(back) == 3
        assert back.topics() == ["gps", "points"]
        assert back.messages[0].stamp == 0.1

    def test_player_with_watermark(self):
        msgs = [Message(0.1 * k, "points", k) for k in range(5)]
        got = []
        wm = Watermark()
        wm.advertise("consumer", 100.0)  # consumer far ahead: never blocks

        def handler(m):
            got.append(m.data)

        BagPlayer(Bag(msgs), {"points": handler}, watermark=wm,
                  wait_timeout=1.0).play()
        assert got == [0, 1, 2, 3, 4]

    def test_bounded_queue(self):
        q = BoundedQueue(maxlen=2)
        assert q.put(1, timeout=0.1)
        assert q.put(2, timeout=0.1)
        assert not q.put(3, timeout=0.05)  # full -> backpressure
        assert q.get() == 1
        assert q.put(3, timeout=0.1)
        q.close()
        assert q.get() == 2
        assert q.get() == 3
        assert q.get() is None


class TestTfTable:
    def test_static_and_inverse(self):
        t = TransformTable()
        T = np.eye(4)
        T[:3, 3] = [1, 2, 3]
        t.set_static("base", "lidar", T)
        np.testing.assert_allclose(t.lookup("base", "lidar"), T)
        np.testing.assert_allclose(
            t.lookup("lidar", "base"), np.linalg.inv(T)
        )
        assert t.can_transform("base", "lidar")
        with pytest.raises(KeyError):
            t.lookup("base", "nonexistent")

    def test_dynamic_nearest(self):
        t = TransformTable()
        for k in range(5):
            T = np.eye(4)
            T[0, 3] = k
            t.add_dynamic("map", "base", float(k), T)
        assert t.lookup("map", "base", 2.2)[0, 3] == 2.0
        assert t.lookup("map", "base", 2.8)[0, 3] == 3.0


class TestGraphIO:
    def _builder(self):
        from delta_graph_slam_tpu.graph import SE2GraphBuilder

        b = SE2GraphBuilder()
        b.add_vertex([0.0, 0.0, 0.0], fixed=True)
        b.add_vertex([1.0, 0.5, 0.1])
        b.add_vertex([2.0, 0.6, 0.2])
        b.add_se2_edge(0, 1, [1.0, 0.5, 0.1], np.diag([10.0, 10.0, 40.0]),
                       kernel="Huber", delta=1.5)
        b.add_se2_edge(1, 2, [1.0, 0.1, 0.1], np.eye(3))
        b.add_prior_xy(2, [2.0, 0.6], np.eye(2) * 5)
        b.add_prior_yaw(2, 0.2, 7.0)
        return b

    def test_g2o_roundtrip(self, tmp_path):
        from delta_graph_slam_tpu.graph import save_g2o, load_g2o

        b = self._builder()
        path = str(tmp_path / "g.g2o")
        save_g2o(b, path)
        back = load_g2o(path)
        assert back.num_vertices == 3
        assert back.fixed[0] and not back.fixed[1]
        np.testing.assert_allclose(back.poses[1], [1.0, 0.5, 0.1])
        e = [x for x in back.edges if x["type"] == "se2"][0]
        np.testing.assert_allclose(e["info"], np.diag([10.0, 10.0, 40.0]))
        from delta_graph_slam_tpu.graph.robust import ROBUST_KERNELS

        assert ROBUST_KERNELS[e["kernel"]] == "Huber"
        assert e["delta"] == 1.5
        yaws = [x for x in back.edges if x["type"] == "yaw"]
        assert len(yaws) == 1
        np.testing.assert_allclose(float(yaws[0]["meas"]), 0.2, atol=1e-9)

    def test_npz_roundtrip(self, tmp_path):
        from delta_graph_slam_tpu.graph import save_npz, load_npz

        b = self._builder()
        path = str(tmp_path / "g.npz")
        save_npz(b, path)
        back = load_npz(path)
        assert back.num_vertices == 3
        assert back.num_edges == b.num_edges
        np.testing.assert_allclose(back.poses[2], [2.0, 0.6, 0.2])

    def test_g2o_se3_roundtrip(self, tmp_path):
        from scipy.spatial.transform import Rotation

        from delta_graph_slam_tpu.graph.se3_graph import SE3GraphBuilder
        from delta_graph_slam_tpu.graph.graph_io import (
            save_g2o_se3, load_g2o_se3,
        )

        b = SE3GraphBuilder()
        q = Rotation.from_euler("xyz", [0.05, -0.1, 0.4]).as_quat()  # xyzw
        pose7 = np.array([1.0, 2.0, 0.3, q[3], q[0], q[1], q[2]])
        b.add_se3_node(np.eye(4), fixed=True)
        b.add_se3_node(pose7)
        b.add_se3_node([2.0, 2.1, 0.3, 1.0, 0.0, 0.0, 0.0])
        info6 = np.diag([10.0, 10.0, 10.0, 40.0, 40.0, 40.0])
        info6[0, 1] = info6[1, 0] = 0.5
        b.add_se3_edge(0, 1, pose7, info6, kernel="Huber", delta=1.5)
        b.add_se3_edge(1, 2, [1.0, 0.1, 0.0, 1.0, 0.0, 0.0, 0.0], np.eye(6))
        pid = b.add_plane_node([0.0, 0.0, 1.0, -0.2])
        b.add_se3_plane_edge(1, pid, [0.0, 0.0, 1.0, -0.2], np.eye(3) * 3)

        path = str(tmp_path / "g3.g2o")
        save_g2o_se3(b, path)
        back = load_g2o_se3(path)
        assert len(back.poses) == 3 and len(back.planes) == 1
        assert back.fixed[0] and not back.fixed[1]
        np.testing.assert_allclose(back.poses[1], pose7, atol=1e-9)
        np.testing.assert_allclose(back.planes[0], [0.0, 0.0, 1.0, -0.2],
                                   atol=1e-9)
        se3 = [e for e in back.edges if e["type"] == "se3"]
        assert len(se3) == 2
        np.testing.assert_allclose(se3[0]["info"], info6, atol=1e-9)
        np.testing.assert_allclose(se3[0]["meas"], pose7, atol=1e-9)
        from delta_graph_slam_tpu.graph.robust import ROBUST_KERNELS

        assert ROBUST_KERNELS[se3[0]["kernel"]] == "Huber"
        assert se3[0]["delta"] == 1.5
        pl = [e for e in back.edges if e["type"] == "se3plane"]
        assert len(pl) == 1 and pl[0]["p"] == 0
        np.testing.assert_allclose(pl[0]["info"], np.eye(3) * 3, atol=1e-9)

    def test_optimization_equivalence(self, tmp_path):
        """Solving a saved+loaded graph matches solving the original."""
        from delta_graph_slam_tpu.graph import (
            SolverConfig, optimize_se2, save_g2o, load_g2o,
        )

        b = self._builder()
        # enough edges to pass the min-edges gate
        for _ in range(8):
            b.add_se2_edge(0, 1, [1.0, 0.5, 0.1], np.eye(3))
        cfg = SolverConfig(backend="dense", max_iterations=20)
        p1, _ = optimize_se2(b.to_arrays(), config=cfg)
        path = str(tmp_path / "g.g2o")
        save_g2o(b, path)
        p2, _ = optimize_se2(load_g2o(path).to_arrays(), config=cfg)
        np.testing.assert_allclose(np.asarray(p1)[:3], np.asarray(p2)[:3],
                                   atol=1e-9)


class TestBuildings:
    def test_parse_and_entities(self):
        from delta_graph_slam_tpu.buildings import (
            BuildingManager, StaticProvider,
        )
        from delta_graph_slam_tpu.io.kitti import make_city_world

        world = make_city_world(seed=3, n_buildings=6)
        xml = world.osm_xml()
        mgr = BuildingManager(
            StaticProvider(xml), origin=np.zeros(3), scale=world.scale,
            radius=50.0, synchronous=True,
        )
        lat0, lon0 = world.origin_gps
        # origin in metric frame: position (0,0) corresponds to lat0/lon0
        import math

        bs = mgr.get_buildings(lat0, lon0)
        assert len(bs) >= 1
        b = bs[0]
        assert b.corners.shape[1] == 2
        assert int(np.asarray(b.cloud.mask).sum()) > 50
        # pose = bbox center
        lo = b.corners.min(0)
        hi = b.corners.max(0)
        np.testing.assert_allclose(b.pose[:2], (lo + hi) / 2, atol=1e-6)
        # re-querying returns the cached entity
        bs2 = mgr.get_buildings(lat0, lon0)
        assert bs2[0] is b

    def test_building_repose(self):
        from delta_graph_slam_tpu.buildings import Building, building_map_transform
        from delta_graph_slam_tpu.lines import make_lines
        from delta_graph_slam_tpu.ops import make_cloud

        corners = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
        pose = np.array([2.0, 2.0, 0.0])
        lines = make_lines(corners, np.roll(corners, -1, 0))
        cloud = make_cloud(np.concatenate([corners, np.zeros((4, 1))], 1))
        b = Building("x", pose, corners, lines, cloud, node_id=0)
        # estimate displaced by (1, 0) with no rotation
        poses = np.array([[3.0, 2.0, 0.0]])
        pts = b.get_points(poses)
        np.testing.assert_allclose(pts, corners + [1.0, 0.0], atol=1e-9)
        # pure rotation about the building center keeps the center fixed
        poses = np.array([[2.0, 2.0, np.pi / 2]])
        T = building_map_transform(pose, poses[0])
        center = np.array([2.0, 2.0])
        np.testing.assert_allclose(T[:2, :2] @ center + T[:2, 2], center,
                                   atol=1e-9)


class TestVizRender:
    def test_svg_and_json_roundtrip(self, tmp_path):
        import json

        import numpy as np

        from delta_graph_slam_tpu.utils.markers import save_viz

        markers = {
            "keyframe_nodes": np.array([[0.0, 0.0], [1.0, 0.5], [2.0, 1.5]]),
            "building_nodes": np.array([[3.0, 3.0]]),
            "edges": [(0, 1, 0), (1, 2, 0), (0, 3, 1)],
            "node_xy": np.array([[0.0, 0.0], [1.0, 0.5], [2.0, 1.5],
                                 [3.0, 3.0]]),
            "loop_close_radius": 15.0,
            "gps": np.array([[0.1, 0.1]]),
            "gt_pose": np.array([[0.0, 0.0], [1.0, 0.6], [2.1, 1.4]]),
        }
        mc = np.random.default_rng(0).uniform(-1, 4, (500, 3))
        save_viz(markers, tmp_path, map_cloud=mc)
        svg = (tmp_path / "markers.svg").read_text()
        assert svg.startswith("<svg") and svg.rstrip().endswith("</svg>")
        assert svg.count("<line") == 3       # one per graph edge
        assert svg.count("<rect") >= 2       # background + building
        assert "<polyline" in svg            # trajectory + gt
        data = json.loads((tmp_path / "markers.json").read_text())
        assert data["loop_close_radius"] == 15.0
        assert len(data["keyframe_nodes"]) == 3
        assert (tmp_path / "markers.png").exists()  # matplotlib available
