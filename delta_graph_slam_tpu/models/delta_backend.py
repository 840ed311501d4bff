"""The delta graph-SLAM backend (SE2 pose graph + buildings).

Rebuild of DeltaGraphSlamNodelet (/root/reference/apps/
delta_graph_slam_nodelet.cpp, 1.4k LoC): keyframe admission, OSM building
constraints via the line scanmatcher, GPS priors, loop closure,
three-level optimization, building de-overlap, map export and ATE/RPE.

Timing/threading model: callbacks enqueue; ``optimization_step()`` is the
3 s wall-timer body (:793-927). All device compute (registration, line
alignment, LM solves) happens inside jitted kernels; the orchestration
below is host logic mirroring the reference control flow, including its
quirks (reversed odometry-edge measurement :570-571; non-short-circuit
update-source evaluation :811; coverage — not percentage — gate at 35
:714).
"""

import dataclasses
import threading
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..geom.host import (
    se2_compose_np, se2_inverse_np, transform_2d_to_3d_np,
    transform_3d_to_2d_np,
)

from ..geom.se3 import yaw_from_rot
from ..geom.projection import mercator_from_gps, gps_from_mercator, mercator_scale
from ..graph import SE2GraphBuilder, SolverConfig, optimize_se2
from ..lines import LineBasedScanmatcher, LineScanmatcherConfig, transform_lines
from ..lines.overlap import are_buildings_overlapped

_overlap_batch = jax.jit(are_buildings_overlapped)


@jax.jit
def _pair_map_lines(ba, bb, bm, bpose, est, ii, jj):
    """Map-frame building outlines for P (i, j) pairs, ONE dispatch.

    ba/bb (B, L, 2) raw download-frame endpoints, bm (B, L) masks,
    bpose (B, 3) fixed OSM poses, est (B, 3) current graph estimates,
    ii/jj (P,) pair indices. Re-poses every building by
    building_map_transform (rotation about the building center,
    building.cpp:7-13) IN-program and gathers the pair tensors — the
    eager per-pair jnp.stack this replaces marshalled O(pairs) device
    arguments through the tunnel per de-overlap round (measured 412 ms
    per overlap test at 14 buildings)."""
    th = est[:, 2] - bpose[:, 2]
    c, s = jnp.cos(th), jnp.sin(th)
    R = jnp.stack([jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)
    t = est[:, :2] - jnp.einsum("bij,bj->bi", R, bpose[:, :2])
    ta = jnp.einsum("bij,blj->bli", R, ba) + t[:, None, :]
    tb = jnp.einsum("bij,blj->bli", R, bb) + t[:, None, :]
    return (ta[ii], tb[ii], bm[ii], est[ii][:, :2],
            ta[jj], tb[jj], bm[jj], est[jj][:, :2])


@jax.jit
def _gather_pair_lines(ba, bb, bm, bidx, ktree, kidx, live):
    """(src, tgt) LineSegments stacks for the align_local pair batch:
    building outlines gathered from the canonical raw stack, keyframe
    scan lines gathered from the stacked unique-keyframe tree. live (P,)
    masks the pow2 padding slots off."""
    from ..ops.ransac import LineSegments

    z = jnp.zeros(bm[bidx].shape, ba.dtype)
    src = LineSegments(a=ba[bidx], b=bb[bidx], mean_error=z, std_sigma=z,
                       max_error=z, min_error=z,
                       mask=bm[bidx] & live[:, None])
    tgt = jax.tree_util.tree_map(lambda x: x[kidx], ktree)
    tgt = tgt._replace(mask=tgt.mask & live[:, None])
    return src, tgt
from ..buildings import BuildingManager, OverpassProvider
from ..pipeline import (
    InformationMatrixCalculator,
    KeyFrame,
    KeyFrameSnapshot,
    KeyframeUpdater,
    LoopDetector,
    MapCloudGenerator,
)
from ..register import RegistrationConfig, make_registration
from ..io.nmea import NmeaSentenceParser
from ..io.pcd import save_pcd
from ..utils.profiling import StageTimer


@dataclasses.dataclass(frozen=True)
class DeltaBackendConfig:
    # graph
    max_keyframes_per_update: int = 10
    keyframe_delta_trans: float = 2.0
    keyframe_delta_angle: float = 2.0
    fix_first_node: bool = True
    g2o_solver_num_iterations: int = 512
    graph_update_interval: float = 3.0
    # preallocated solver capacities (static XLA shapes): every pow2
    # capacity growth recompiles the LM program (~20-60 s through the
    # remote compile helper), so start at the expected session scale.
    # The graph still grows past these; 0 = pure auto (pow2 of live size).
    solver_v_capacity: int = 512
    solver_e_capacity: int = 2048
    # gps
    enable_gps_priors: bool = False
    gps_edge_stddev_xy: float = 1500.0
    gps_time_offset: float = 0.0
    gps_edge_robust_kernel: str = "NONE"
    gps_edge_robust_kernel_size: float = 1.0
    # loop closure
    distance_thresh: float = 15.0
    accum_distance_thresh: float = 25.0
    min_edge_interval: float = 15.0
    fitness_score_thresh: float = 2.5
    fitness_score_max_range: float = float("inf")
    loop_closure_edge_robust_kernel: str = "Huber"
    loop_closure_edge_robust_kernel_size: float = 1.0
    odometry_edge_robust_kernel: str = "NONE"
    odometry_edge_robust_kernel_size: float = 1.0
    building_edge_robust_kernel: str = "NONE"
    building_edge_robust_kernel_size: float = 1.0
    # buildings
    enable_buildings: bool = True
    nearby_buildings_radius: float = 35.0
    buffer_buildings_radius: float = 120.0
    overpass_host: str = "https://overpass-api.de"
    # init
    init_x: float = 0.0
    init_y: float = 0.0
    init_angle_deg: float = 0.0
    use_imu_for_initial_orientation: bool = False
    compute_ate_rpe: bool = False
    # sub-configs
    registration: RegistrationConfig = dataclasses.field(
        default_factory=lambda: RegistrationConfig(
            method="FAST_GICP", transformation_epsilon=0.1,
            maximum_iterations=64, max_correspondence_distance=2.0,
        )
    )
    scanmatcher: LineScanmatcherConfig = dataclasses.field(
        default_factory=lambda: LineScanmatcherConfig(
            min_cluster_size=40, cluster_tolerance=1.5,
            sac_distance_threshold=0.1, max_iterations=100,
            merror_threshold=0.1, line_length_threshold=1.5,
            g_avg_distance_weight=1.5, g_coverage_weight=0.5,
            g_transform_weight=0.5, g_max_score_distance=3.5,
            g_max_score_translation=3.5,
            l_avg_distance_weight=1.5, l_coverage_weight=1.5,
            l_transform_weight=0.1, l_max_score_distance=1.0,
            l_max_score_translation=3.5,
        )
    )
    # chain: direct BCR + Woodbury solve (graph/chain_solve.py) — the
    # delta graph is a keyframe chain with few off-chain couplings
    # (loops, interleaved-building odometry skips, de-overlap edges);
    # measured both faster and far better-converged than truncated CG.
    solver: SolverConfig = dataclasses.field(
        default_factory=lambda: SolverConfig(backend="chain")
    )
    inf: InformationMatrixCalculator = dataclasses.field(
        default_factory=lambda: InformationMatrixCalculator(
            b_var_gain_a=7.0, b_max_stddev_x=2.0,
            b_avg_fitness_score=1.75,
            b_importance_ratio_global=500.0, b_importance_ratio_local=25.0,
        )
    )


def _se2_of(T4):
    return transform_3d_to_2d_np(T4)


def _locked(fn, attr="lock"):
    """Serialize an entry point on a named backend lock. Wait time is
    recorded per entry point (lock_wait.<name>) so stage means separate
    real work from cross-thread serialization.

    The backend mirrors the reference's fine-grained mutex shape
    (delta_graph_slam_nodelet.cpp:1316-1355): the expensive per-keyframe
    work (get_buildings HTTP + align_global) runs OUTSIDE any lock shared
    with the optimizer — cloud_callback only touches trans_odom2map (its
    own tiny lock) and the keyframe queue (its own lock), exactly like
    the reference's cloud_callback (:344-358). The r4 design serialized
    every entry point on ONE RLock with the ~2 s align_global inside it,
    which measured as ~55 s of feeder-thread blocking per bench window
    (BENCH_r04 lock_wait.gps_callback)."""
    import functools
    import time as _time

    @functools.wraps(fn)
    def wrapper(self, *a, **kw):
        t0 = _time.perf_counter()
        with getattr(self, attr):
            dt = _time.perf_counter() - t0
            if dt > 1e-4:
                self.timer.totals["lock_wait." + fn.__name__] += dt
                self.timer.counts["lock_wait." + fn.__name__] += 1
            return fn(self, *a, **kw)

    return wrapper


class DeltaBackend:
    def __init__(self, cfg: DeltaBackendConfig = DeltaBackendConfig(),
                 building_provider=None):
        self.cfg = cfg
        self.graph = SE2GraphBuilder()
        self.keyframe_updater = KeyframeUpdater(
            cfg.keyframe_delta_trans, cfg.keyframe_delta_angle
        )
        self.registration = make_registration(cfg.registration)
        self.loop_detector = LoopDetector(
            self.registration,
            distance_thresh=cfg.distance_thresh,
            accum_distance_thresh=cfg.accum_distance_thresh,
            min_edge_interval=cfg.min_edge_interval,
            fitness_score_max_range=cfg.fitness_score_max_range,
            fitness_score_thresh=cfg.fitness_score_thresh,
        )
        self.scanmatcher = LineBasedScanmatcher(cfg.scanmatcher)
        self.inf_calculator = cfg.inf
        self.map_generator = MapCloudGenerator()
        self.nmea_parser = NmeaSentenceParser()
        self.timer = StageTimer()

        self.keyframes: List[KeyFrame] = []
        self.new_keyframes: List[KeyFrame] = []
        self.keyframe_queue: List[KeyFrame] = []
        self.gps_queue: List[tuple] = []  # (stamp, lat, lon)
        self.snapshots: List[KeyFrameSnapshot] = []

        th = np.deg2rad(cfg.init_angle_deg)
        self.trans_odom2map = np.array([cfg.init_x, cfg.init_y, th])
        self.adjust_initial_orientation = not cfg.use_imu_for_initial_orientation
        self.initial_orientation_yaw = 0.0
        self._imu_seen = False

        self.origin: Optional[np.ndarray] = None
        self.scale: Optional[float] = None
        self.buildings_manager: Optional[BuildingManager] = None
        self._building_provider = building_provider

        self.anchor_node: Optional[int] = None
        self.anchor_edge_id: Optional[int] = None
        self.overlap_edge_ids: List[int] = []
        self.read_until_stamp = 0.0
        # The reference's four-mutex shape (delta_graph_slam_nodelet.cpp
        # :1316-1355): graph/keyframes/snapshots behind the main lock
        # (held only by the optimizer + checkpointing), each message queue
        # behind its own tiny lock, and trans_odom2map behind its own —
        # so the per-keyframe align_global/get_buildings in cloud_callback
        # never blocks the optimizer or the GPS feed (and vice versa).
        self.lock = threading.RLock()            # main_thread_mutex
        self.kf_queue_lock = threading.Lock()    # keyframe_queue_mutex
        self.gps_queue_lock = threading.Lock()   # gps_queue_mutex
        self.odom2map_lock = threading.Lock()    # trans_odom2map_mutex

    # ------------------------------------------------------------- poses
    @property
    def poses(self):
        return np.stack(self.graph.poses) if self.graph.poses else np.zeros((0, 3))

    # ---------------------------------------------------------- gps path
    # Graph mutations on behalf of the building manager: buildings are
    # discovered on the cloud_callback / download threads while the
    # optimizer may hold the graph — serialize on the main lock (the
    # reference mutates g2o from the callback thread unguarded,
    # building_tools.cpp:137-148; we close that race).
    def _graph_add_vertex(self, pose):
        with self.lock:
            return self.graph.add_vertex(pose)

    def _graph_add_prior_xy(self, v, xy, w):
        with self.lock:
            return self.graph.add_prior_xy(v, xy, np.eye(2) * w, level=1)

    def _graph_add_prior_yaw(self, v, yaw, w):
        with self.lock:
            return self.graph.add_prior_yaw(v, yaw, w, level=1)

    def gps_callback(self, stamp, lat, lon, alt=0.0):
        stamp = stamp + self.cfg.gps_time_offset
        with self.gps_queue_lock:
            first = self.origin is None
            if first:
                self.scale = float(mercator_scale(lat))
                xyz = np.asarray(
                    mercator_from_gps(np.float64(lat), np.float64(lon),
                                      np.float64(alt), scale=self.scale)
                )
                self.origin = xyz.copy()
                provider = self._building_provider or OverpassProvider(
                    self.cfg.overpass_host
                )
                mgr = BuildingManager(
                    provider, self.origin, self.scale,
                    graph_add_vertex=self._graph_add_vertex,
                    graph_add_prior_xy=self._graph_add_prior_xy,
                    graph_add_prior_yaw=self._graph_add_prior_yaw,
                    radius=self.cfg.nearby_buildings_radius,
                    buffer_radius=self.cfg.buffer_buildings_radius,
                )
            self.gps_queue.append((stamp, lat, lon))
        if first:
            mgr.get_buildings(lat, lon)
            self.buildings_manager = mgr  # publish only once initialized

    def nmea_callback(self, stamp, sentence):
        rmc = self.nmea_parser.parse(sentence)
        if rmc.valid:
            self.gps_callback(stamp, rmc.latitude, rmc.longitude, float("nan"))

    def navsat_callback(self, stamp, lat, lon, alt):
        self.gps_callback(stamp, lat, lon, alt)

    def imu_callback(self, quat_wxyz):
        """First IMU message fixes the initial orientation (:388-421)."""
        if self._imu_seen:
            return
        self._imu_seen = True
        from ..geom.se3 import quat_to_rot

        R = np.asarray(quat_to_rot(jnp.asarray(quat_wxyz, jnp.float64)))
        yaw = float(yaw_from_rot(jnp.asarray(R)))
        self.initial_orientation_yaw = yaw
        if self.cfg.use_imu_for_initial_orientation:
            rot = np.array([0.0, 0.0, yaw])
            with self.odom2map_lock:
                self.trans_odom2map = se2_compose_np(rot, self.trans_odom2map)
            self._update_anchor(rot)

    def _update_anchor(self, pose):
        with self.lock:
            if self.anchor_node is not None and self.keyframes:
                self.graph.set_pose(self.anchor_node, pose)

    def _get_odom2map(self):
        with self.odom2map_lock:
            return self.trans_odom2map.copy()

    # ------------------------------------------------------ keyframe path
    def cloud_callback(self, stamp, odom_4x4, cloud, flat_cloud,
                       gt_pose=None):
        """Synchronized (odom, cloud, flat_cloud) arrival (:202-359).

        Deliberately lock-free on the expensive path: get_buildings and
        align_global run without holding any lock the optimizer needs
        (the reference computes align_global before taking
        keyframe_queue_mutex, delta:278,:344-358). Must be called from a
        single thread (the pipeline's backend worker) — keyframe_updater
        state is not shared with any other entry point."""
        mgr = self.buildings_manager
        if mgr is None:
            return  # :206-209
        odom2d = _se2_of(odom_4x4)
        add_keyframe = self.keyframe_updater.update(odom2d)
        if not add_keyframe and not self.adjust_initial_orientation:
            if not self.keyframe_queue:
                self.read_until_stamp = stamp + 3.0
            return

        odom2map = self._get_odom2map()
        map_pose = se2_compose_np(odom2map, odom2d)

        # reverse-Mercator of the current estimated position (:243-251)
        xyz = np.array([map_pose[0], map_pose[1], 0.0]) + self.origin
        gps = gps_from_mercator(xyz, scale=self.scale)
        with self.timer.stage("get_buildings"):
            buildings = mgr.get_buildings(gps[0], gps[1])

        estimated_odom = map_pose.copy()
        result = None
        if buildings:
            with self.timer.stage("align_global"):
                # building lines into the sensor frame (:274-276) —
                # concatenated from the host-resident corner polygons
                # (pulling each building's device line arrays cost ~3
                # tunnel round-trips per building per keyframe)
                blines = _concat_lines(
                    buildings, capacity=self.cfg.scanmatcher.max_target_lines,
                )
                inv3d = transform_2d_to_3d_np(se2_inverse_np(map_pose))
                blines = transform_lines(blines, inv3d)
                result = self.scanmatcher.align_global(
                    flat_cloud, blines, constrain_angle=add_keyframe,
                    max_range=3.5,
                )
            odom_trans2d = _se2_of(np.asarray(result.transformation))
            estimated_odom = se2_compose_np(map_pose, odom_trans2d)

            # initial-yaw bootstrap between 1st and 2nd keyframe (:295-314)
            if self.adjust_initial_orientation and not add_keyframe:
                trans = se2_compose_np(odom2map, odom_trans2d)
                trans[:2] = 0.0
                self._update_anchor(trans)
                with self.odom2map_lock:
                    self.trans_odom2map = trans

        if add_keyframe:
            accum_d = self.keyframe_updater.get_accum_distance()
            if accum_d > 0:
                self.adjust_initial_orientation = False
            kf = KeyFrame(
                stamp=stamp, odom=np.asarray(odom_4x4), odom2d=odom2d,
                accum_distance=accum_d, cloud=cloud, flat_cloud=flat_cloud,
                estimated_odom=estimated_odom,
                global_alignment=result, near_buildings=buildings,
                gt_pose=None if gt_pose is None else np.asarray(gt_pose),
            )
            with self.kf_queue_lock:
                self.keyframe_queue.append(kf)

    # --------------------------------------------------------- queue flush
    def flush_keyframe_queue(self) -> bool:
        with self.kf_queue_lock:
            if not self.keyframe_queue:
                return False
            n = min(len(self.keyframe_queue),
                    self.cfg.max_keyframes_per_update)
            batch = self.keyframe_queue[:n]
            del self.keyframe_queue[:n]
        odom2map = self._get_odom2map()
        pending = []   # (kf, prev, rel2d) awaiting the batched info calc
        for i in range(n):
            kf = batch[i]
            self.new_keyframes.append(kf)
            odom = se2_compose_np(odom2map, kf.odom2d)
            kf.node_id = self.graph.add_vertex(odom)
            if not self.keyframes and len(self.new_keyframes) == 1:
                self.anchor_node = self.graph.add_vertex(
                    odom2map, fixed=self.cfg.fix_first_node
                )
                self.anchor_edge_id = self.graph.add_se2_edge(
                    self.anchor_node, kf.node_id, np.zeros(3), np.eye(3)
                )
                continue
            prev = self.keyframes[-1] if i == 0 else batch[i - 1]
            # reversed measurement convention (:570-571)
            rel2d = se2_compose_np(se2_inverse_np(kf.odom2d), prev.odom2d)
            pending.append((kf, prev, rel2d))
        if pending:
            with self.timer.stage("information_matrix"):
                infos = self.inf_calculator.calc_information_matrices([
                    (kf.cloud, prev.cloud, np.linalg.inv(kf.odom) @ prev.odom)
                    for kf, prev, _ in pending
                ])
            for (kf, prev, rel2d), info in zip(pending, infos):
                self.graph.add_se2_edge(
                    kf.node_id, prev.node_id, rel2d, info, level=0,
                    kernel=self.cfg.odometry_edge_robust_kernel,
                    delta=self.cfg.odometry_edge_robust_kernel_size,
                )
        return True

    def flush_gps_queue(self) -> bool:
        with self.gps_queue_lock:
            gps_queue = list(self.gps_queue)
        if not self.keyframes or not gps_queue:
            return False
        updated = False
        stamps = [g[0] for g in gps_queue]
        for kf in self.keyframes:
            if kf.stamp > stamps[-1]:
                break
            if kf.stamp < stamps[0] or kf.gps_coord is not None:
                continue
            dt = [abs(s - kf.stamp) for s in stamps]
            j = int(np.argmin(dt))
            if dt[j] > 0.1:
                continue
            _, lat, lon = gps_queue[j]
            xyz = np.asarray(
                mercator_from_gps(np.float64(lat), np.float64(lon), 0.0,
                                  scale=self.scale)
            ) - self.origin
            gps_coord = xyz[:2]
            if not self.cfg.compute_ate_rpe:
                kf.gps_coord = gps_coord
            if self.cfg.enable_gps_priors:
                info = np.eye(2) / self.cfg.gps_edge_stddev_xy
                self.graph.add_prior_xy(
                    kf.node_id, gps_coord, info, level=0,
                    kernel=self.cfg.gps_edge_robust_kernel,
                    delta=self.cfg.gps_edge_robust_kernel_size,
                )
                updated = True
        last = self.keyframes[-1].stamp
        with self.gps_queue_lock:
            self.gps_queue = [g for g in self.gps_queue if g[0] > last]
        return updated

    # --------------------------------------------------- building updates
    def update_building_nodes(self) -> bool:
        """Per-cycle keyframe<->building constraints (delta:639-737).

        The per-pair align_local calls are batched into ONE device
        dispatch (frame transforms applied in-program): the reference's
        sequential loop shape (:687) costs a host round-trip per pair,
        which at city density (dozens of buildings in 35 m) serializes
        into seconds per cycle on a remote device. The pair count is
        bucketed to a power of two so cycles reuse compiled programs.
        """
        if not self.cfg.enable_buildings or not self.new_keyframes:
            return False
        updated = False
        odom2map = self._get_odom2map()

        pairs = []
        for idx, kf in enumerate(self.new_keyframes):
            # skip very first keyframe of the run (:652-656)
            if not self.keyframes and idx == 0:
                break
            if kf.global_alignment is None or not kf.near_buildings:
                continue
            odom = se2_compose_np(odom2map, kf.odom2d)
            odom3d = transform_2d_to_3d_np(odom)
            for b in kf.near_buildings:
                bpose3d = transform_2d_to_3d_np(b.pose)
                bpose_inv = np.linalg.inv(bpose3d)
                pairs.append((kf, b, odom, bpose_inv, bpose_inv @ odom3d))

        if pairs:
            B = len(pairs)
            P = 1 << max(B - 1, 0).bit_length()
            # building side: gather raw outlines from the canonical
            # device stack by pair index; keyframe side: stack the few
            # UNIQUE keyframes' line trees once and gather per pair —
            # the eager per-pair jnp.stack this replaces marshalled
            # O(pairs) device arguments per cycle (~0.5 s at 64 pairs)
            bs = list(self.buildings_manager.buildings)
            ba, bb_, bm, _bp = self._building_stack(bs)
            pos_of = {id(b): k for k, b in enumerate(bs)}
            bidx = [pos_of[id(p[1])] for p in pairs] + [0] * (P - B)
            kfs, kpos = [], {}
            for p in pairs:
                if id(p[0]) not in kpos:
                    kpos[id(p[0])] = len(kfs)
                    kfs.append(p[0])
            kidx = [kpos[id(p[0])] for p in pairs] + [0] * (P - B)
            ktree = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[k.global_alignment.not_aligned_lines for k in kfs]
            )
            Ts = np.stack([p[3] for p in pairs]
                          + [np.eye(4)] * (P - B)).astype(np.float32)
            Tt = np.stack([p[4] for p in pairs]
                          + [np.eye(4)] * (P - B)).astype(np.float32)
            with self.timer.stage("align_local"):
                src, tgt = _gather_pair_lines(
                    ba, bb_, bm, jnp.asarray(np.asarray(bidx, np.int32)),
                    ktree, jnp.asarray(np.asarray(kidx, np.int32)),
                    jnp.asarray(np.arange(P) < B),
                )
                res = self.scanmatcher.align_local_batch(
                    src, tgt, Ts, Tt, 0.5
                )
                T_all = np.asarray(res.transformation)
            avg_d = np.asarray(res.fitness.avg_distance)
            cov = np.asarray(res.fitness.coverage_percentage)
            edge_al = np.asarray(res.is_edge_aligned)

            for k, (kf, b, odom, _, _) in enumerate(pairs):
                T = T_all[k]
                if np.allclose(T, np.eye(4), atol=1e-9):
                    continue
                info = self.inf_calculator.calc_information_matrix_buildings_local(
                    float(avg_d[k]), float(cov[k]), bool(edge_al[k])
                )
                trans2d = _se2_of(T)
                # relpose keyframe -> (building.pose * trans) (:700-703)
                bt = se2_compose_np(b.pose, trans2d)
                relpose = se2_compose_np(se2_inverse_np(odom), bt)
                self.graph.add_se2_edge(
                    kf.node_id, b.node_id, relpose, info, level=1,
                    kernel=self.cfg.building_edge_robust_kernel,
                    delta=self.cfg.building_edge_robust_kernel_size,
                )
                updated = True

        # global-alignment position/yaw priors (:710-727)
        for idx, kf in enumerate(self.new_keyframes):
            if not self.keyframes and idx == 0:
                break
            if kf.global_alignment is None or not kf.near_buildings:
                continue
            ga = kf.global_alignment
            if float(ga.fitness.coverage) < 35.0:
                continue
            info3 = self.inf_calculator.calc_information_matrix_buildings_global(
                float(ga.fitness.real_avg_distance)
            )
            self.graph.add_prior_xy(
                kf.node_id, kf.estimated_odom[:2], info3[:2, :2], level=0,
                kernel=self.cfg.building_edge_robust_kernel,
                delta=self.cfg.building_edge_robust_kernel_size,
            )
            self.graph.add_prior_yaw(
                kf.node_id, kf.estimated_odom[2], info3[2, 2], level=0,
                kernel=self.cfg.building_edge_robust_kernel,
                delta=self.cfg.building_edge_robust_kernel_size,
            )
        if self.new_keyframes:
            self.read_until_stamp = self.new_keyframes[-1].stamp + 3.0
        return updated

    def get_overlapped_buildings(self):
        """All overlapping building pairs in ONE batched device dispatch.

        The naive per-pair loop costs O(B^2) separate device calls with a
        host sync each (~30 ms RTT on the tunnel = seconds per de-overlap
        round at 14 buildings); here every pair's shrunken-polygon test
        runs in a single (P, La, Lb) batch and one bool-vector fetch.
        """
        bs, idx = self._overlapped_pairs()
        return [(bs[i], bs[j]) for i, j in idx]

    def _overlapped_pairs(self):
        """(buildings list, [(i, j) index pairs] of overlapped ones)."""
        if self.buildings_manager is None:
            return [], []
        # snapshot: the cloud_callback thread may append new buildings
        # while the optimizer runs (list() is atomic under the GIL;
        # Building entities are immutable after creation)
        bs = list(self.buildings_manager.buildings)
        if len(bs) < 2:
            return bs, []
        poses = self.poses
        ba, bb, bm, bp = self._building_stack(bs)
        est = self._building_estimates(bs, poses, bp.shape[0])
        pairs = [(i, j) for i in range(len(bs)) for j in range(i + 1, len(bs))]
        P = len(pairs)
        # pad to a power of two: few distinct compiles as the city grows
        cap = 1 << max(P - 1, 1).bit_length()
        pad = cap - P
        ii = np.asarray([p[0] for p in pairs] + [0] * pad, np.int32)
        jj = np.asarray([p[1] for p in pairs] + [0] * pad, np.int32)
        out8 = _pair_map_lines(ba, bb, bm, bp, jnp.asarray(est),
                               jnp.asarray(ii), jnp.asarray(jj))
        ov = np.asarray(_overlap_batch(*out8))[:P]
        return bs, [p for p, o in zip(pairs, ov) if o]

    def _building_stack(self, bs):
        """Canonical device stack of raw building outlines (download
        frame), rebuilt only when the building count crosses a pow2
        bucket boundary or new buildings arrive. Returns
        (a (B,L,2), b (B,L,2), mask (B,L), poses (B,3)) jnp arrays."""
        n = len(bs)
        cached = getattr(self, "_bstack", None)
        if cached is not None and cached[0] == n:
            return cached[1]
        cap = 1 << max(n - 1, 1).bit_length()
        L = max(b.lines.a.shape[0] for b in bs)
        a = np.zeros((cap, L, 2), np.float32)
        bpts = np.zeros((cap, L, 2), np.float32)
        m = np.zeros((cap, L), bool)
        bp = np.zeros((cap, 3), np.float32)
        for k, b in enumerate(bs):
            la = np.asarray(b.lines.a)
            a[k, : len(la)] = la
            bpts[k, : len(la)] = np.asarray(b.lines.b)
            m[k, : len(la)] = np.asarray(b.lines.mask)
            bp[k] = np.asarray(b.pose)
        out = (jnp.asarray(a), jnp.asarray(bpts), jnp.asarray(m),
               jnp.asarray(bp))
        self._bstack = (n, out)
        return out

    @staticmethod
    def _building_estimates(bs, poses, cap):
        est = np.zeros((cap, 3), np.float32)
        for k, b in enumerate(bs):
            est[k] = b.estimate(poses)
        return est

    @staticmethod
    def _line_stack_of(a, b, mask, zeros):
        """Batched LineSegments from gathered endpoint tensors (stats
        zero — building outlines carry no RANSAC fit stats)."""
        from ..ops.ransac import LineSegments

        return LineSegments(a=a, b=b, mean_error=zeros, std_sigma=zeros,
                            max_error=zeros, min_error=zeros, mask=mask)

    # --------------------------------------------------------- optimization
    def _optimize(self, level):
        vc = self.cfg.solver_v_capacity or None
        if vc:
            while vc < len(self.graph.poses):
                vc *= 2
        chain = self.cfg.solver.backend == "chain"
        with self.timer.stage("optimize_pack"):
            g = self.graph.to_arrays(
                v_capacity=vc, e_capacity=self.cfg.solver_e_capacity or None,
                chain_first=chain,
            )
        cfg = dataclasses.replace(
            self.cfg.solver,
            max_iterations=min(self.cfg.solver.max_iterations,
                               self.cfg.g2o_solver_num_iterations),
        )
        off_hint = local_hint = None
        if cfg.backend == "chain":
            off_hint = self.graph.count_offchain(level)
            local_hint = self.graph.spike_local_need(g.poses.shape[0], level)
        poses, stats = optimize_se2(
            g, level=level, config=cfg, off_hint=off_hint,
            n_chain=g.poses.shape[0] - 1 if chain else 0,
            local_hint=local_hint,
        )
        self.graph.update_poses(np.asarray(poses))
        return stats

    @_locked
    def optimization_step(self) -> dict:
        """The 3 s wall-timer body (:793-927). Returns stats."""
        stats = {}
        with self.timer.stage("kf_flush"):
            kf_updated = self.flush_keyframe_queue()
        if not kf_updated:
            self.read_until_stamp += 5.0
        gps_updated = self.flush_gps_queue()
        with self.timer.stage("building_nodes"):
            b_updated = self.update_building_nodes()
        if not (kf_updated | gps_updated | b_updated):
            return stats

        with self.timer.stage("loop_detection"):
            loops = self.loop_detector.detect(
                self.keyframes, self.new_keyframes, self.poses
            )
        for loop in loops:
            rel3d = loop.relative_pose
            info = self.inf_calculator.calc_information_matrix(
                loop.key1.cloud, loop.key2.cloud, rel3d
            )
            self.graph.add_se2_edge(
                loop.key1.node_id, loop.key2.node_id, loop.relpose_2d, info,
                level=0,
                kernel=self.cfg.loop_closure_edge_robust_kernel,
                delta=self.cfg.loop_closure_edge_robust_kernel_size,
            )
        stats["loops"] = len(loops)

        self.keyframes.extend(self.new_keyframes)
        self.new_keyframes = []

        # two-phase optimization (:830-844)
        with self.timer.stage("optimize_level0"):
            for kf in self.keyframes:
                self.graph.set_fixed(kf.node_id, False)
            s0 = self._optimize(0)
        with self.timer.stage("optimize_level1"):
            for kf in self.keyframes:
                self.graph.set_fixed(kf.node_id, True)
            s1 = self._optimize(1)
        stats["chi2_level0"] = float(s0.chi2_final)
        stats["chi2_level1"] = float(s1.chi2_final)

        # de-overlap loop (:846-899)
        for eid in self.overlap_edge_ids:
            self.graph.remove_edge(eid)
        self.overlap_edge_ids = []
        deoverlap_rounds = 0
        if self.cfg.enable_buildings:
            for _ in range(15):
                with self.timer.stage("overlap_test"):
                    bs, idx = self._overlapped_pairs()
                if not idx:
                    break
                pairs = [(bs[i], bs[j]) for i, j in idx]
                poses = self.poses
                with self.timer.stage("align_overlapped"):
                    # ONE device program for all overlapped pairs of the
                    # round (the reference loops align_overlapped_buildings
                    # per pair, delta:873-885); pow2 bucketing reuses
                    # compiled programs as the pair count varies. Map-frame
                    # pair line stacks come from the canonical device
                    # stack via _pair_map_lines (one dispatch), not an
                    # eager O(pairs)-argument jnp.stack.
                    B = len(pairs)
                    P2 = 1 << max(B - 1, 0).bit_length()
                    ba_, bb_, bm_, bp_ = self._building_stack(bs)
                    est = self._building_estimates(bs, poses, bp_.shape[0])
                    ii = np.asarray([i for i, _ in idx] + [0] * (P2 - B),
                                    np.int32)
                    jj = np.asarray([j for _, j in idx] + [0] * (P2 - B),
                                    np.int32)
                    (laa, lab, lam_, _, lba, lbb, lbm, _) = _pair_map_lines(
                        ba_, bb_, bm_, bp_, jnp.asarray(est),
                        jnp.asarray(ii), jnp.asarray(jj))
                    if P2 > B:
                        live = jnp.asarray(
                            np.arange(P2) < B)[:, None]
                        lam_ = lam_ & live
                        lbm = lbm & live
                    zP = jnp.zeros(lam_.shape, laa.dtype)
                    la = self._line_stack_of(laa, lab, lam_, zP)
                    lb = self._line_stack_of(lba, lbb, lbm, zP)
                    pa = np.stack([A.estimate(poses) for A, _ in pairs]
                                  + [np.zeros(3)] * (P2 - B))
                    pb = np.stack([Bb.estimate(poses) for _, Bb in pairs]
                                  + [np.zeros(3)] * (P2 - B))
                    T_all, found = self.scanmatcher.align_overlapped_batch(
                        la, lb, pa, pb)
                    T_all = np.asarray(T_all, np.float64)
                    found = np.asarray(found)
                for k, (A, Bb) in enumerate(pairs):
                    if not found[k]:
                        continue
                    trans2d = _se2_of(T_all[k])
                    ta = se2_compose_np(trans2d, A.estimate(poses))
                    relpose = se2_compose_np(
                        se2_inverse_np(ta), Bb.estimate(poses)
                    )
                    eid = self.graph.add_se2_edge(
                        A.node_id, Bb.node_id, relpose, np.eye(3) * 1e4,
                        level=2,
                        kernel=self.cfg.building_edge_robust_kernel,
                        delta=self.cfg.building_edge_robust_kernel_size,
                    )
                    self.overlap_edge_ids.append(eid)
                with self.timer.stage("optimize_level2"):
                    self._optimize(2)
                deoverlap_rounds += 1
        stats["deoverlap_rounds"] = deoverlap_rounds

        # odom->map update + snapshots (:905-916)
        if self.keyframes:
            poses = self.poses
            last = self.keyframes[-1]
            est = last.estimate(poses)
            with self.odom2map_lock:
                self.trans_odom2map = se2_compose_np(
                    est, se2_inverse_np(last.odom2d)
                )
            with self.timer.stage("snapshots"):
                self.snapshots = [
                    KeyFrameSnapshot(
                        pose=kf.estimate(poses), cloud=kf.cloud,
                        flat_cloud=kf.flat_cloud,
                    )
                    for kf in self.keyframes
                ]
        return stats

    # ------------------------------------------------------------- export
    def save_map(self, destination, resolution=0.05) -> bool:
        import os

        os.makedirs(destination, exist_ok=True)
        cloud = self.map_generator.generate(self.snapshots, resolution)
        if cloud is None or not len(cloud):
            return False
        save_pcd(os.path.join(destination, "map.pcd"), cloud)
        if self.buildings_manager is not None:
            poses = self.poses
            raw = []
            aligned = []
            for b in list(self.buildings_manager.buildings):
                pts = np.asarray(b.cloud.points)[np.asarray(b.cloud.mask)]
                raw.append(pts)
                ac = b.get_cloud(poses)
                aligned.append(np.asarray(ac.points)[np.asarray(ac.mask)])
            if raw:
                save_pcd(os.path.join(destination, "b_map.pcd"),
                         np.concatenate(raw))
                save_pcd(os.path.join(destination, "aligned_b_map.pcd"),
                         np.concatenate(aligned))
        return True

    def dump_graph(self, destination) -> bool:
        """DumpGraph service equivalent (srv/DumpGraph.srv; the reference
        keeps GraphSLAM::save unused at graph_slam.cpp:354-361): writes the
        g2o text graph + .kernels sidecar and the array checkpoint."""
        import os

        os.makedirs(destination, exist_ok=True)
        from ..graph.graph_io import save_g2o, save_npz

        save_g2o(self.graph, os.path.join(destination, "graph.g2o"))
        save_npz(self.graph, os.path.join(destination, "graph.npz"))
        return True

    # ------------------------------------------------------- checkpointing
    @_locked
    def save_state(self, path):
        """Full-session checkpoint: graph + keyframes + buildings + frames
        of reference. Array-native (npz); resume with load_state. (The
        reference only persists the g2o graph, graph_slam.cpp:354-361 —
        our checkpoint restores the whole backend.)"""
        kfs = self.keyframes
        data = dict(
            trans_odom2map=self.trans_odom2map,
            origin=self.origin if self.origin is not None else np.zeros(0),
            scale=np.float64(self.scale or 0.0),
            accum_distance=np.float64(self.keyframe_updater.accum_distance),
            prev_keypose=self.keyframe_updater.prev_keypose,
            kf_is_first=np.bool_(self.keyframe_updater.is_first),
            last_edge_accum=np.float64(
                self.loop_detector.last_edge_accum_distance
            ),
            adjust_initial=np.bool_(self.adjust_initial_orientation),
            anchor_node=np.int64(
                -1 if self.anchor_node is None else self.anchor_node
            ),
            kf_stamps=np.asarray([k.stamp for k in kfs]),
            kf_odom=np.asarray([k.odom for k in kfs]).reshape(-1, 4, 4),
            kf_odom2d=np.asarray([k.odom2d for k in kfs]).reshape(-1, 3),
            kf_accum=np.asarray([k.accum_distance for k in kfs]),
            kf_node=np.asarray(
                [-1 if k.node_id is None else k.node_id for k in kfs],
                np.int64,
            ),
            kf_est_odom=np.asarray(
                [k.estimated_odom if k.estimated_odom is not None
                 else np.full(3, np.nan) for k in kfs]
            ).reshape(-1, 3),
            kf_gps=np.asarray(
                [k.gps_coord if k.gps_coord is not None
                 else np.full(2, np.nan) for k in kfs]
            ).reshape(-1, 2),
            kf_gt=np.asarray(
                [k.gt_pose if k.gt_pose is not None
                 else np.full(3, np.nan) for k in kfs]
            ).reshape(-1, 3),
            kf_clouds=np.asarray(
                [np.asarray(k.cloud.points)[np.asarray(k.cloud.mask)]
                 for k in kfs], object,
            ),
            kf_flat=np.asarray(
                [np.asarray(k.flat_cloud.points)[np.asarray(k.flat_cloud.mask)]
                 if k.flat_cloud is not None else np.zeros((0, 3))
                 for k in kfs], object,
            ),
        )
        if self.buildings_manager is not None:
            bs = self.buildings_manager.buildings
            data["b_ids"] = np.asarray([b.id for b in bs], object)
            data["b_poses"] = np.asarray([b.pose for b in bs]).reshape(-1, 3)
            data["b_corners"] = np.asarray([b.corners for b in bs], object)
            data["b_nodes"] = np.asarray(
                [-1 if b.node_id is None else b.node_id for b in bs], np.int64
            )
        np.savez_compressed(path, **data)
        from ..graph.graph_io import save_npz as save_graph_npz

        save_graph_npz(self.graph, str(path) + ".graph.npz")

    def load_state(self, path, cloud_capacity=32768, flat_capacity=8192):
        """Restore a save_state checkpoint (graph, keyframes, buildings)."""
        from ..graph.graph_io import load_npz as load_graph_npz
        from ..ops import make_cloud
        from ..lines import make_lines
        from ..buildings import Building, StaticProvider, BuildingManager
        from ..geom.interpolate import interpolate_segment
        from ..ops.cloud import MaskedCloud as MC

        z = np.load(path, allow_pickle=True)
        self.graph = load_graph_npz(str(path) + ".graph.npz")
        self.trans_odom2map = z["trans_odom2map"]
        self.origin = z["origin"] if z["origin"].size else None
        self.scale = float(z["scale"]) or None
        self.keyframe_updater.accum_distance = float(z["accum_distance"])
        self.keyframe_updater.prev_keypose = z["prev_keypose"]
        self.keyframe_updater.is_first = bool(z["kf_is_first"])
        self.loop_detector.last_edge_accum_distance = float(
            z["last_edge_accum"]
        )
        self.adjust_initial_orientation = bool(z["adjust_initial"])
        a = int(z["anchor_node"])
        self.anchor_node = None if a < 0 else a

        self.keyframes = []
        for i in range(len(z["kf_stamps"])):
            est = z["kf_est_odom"][i]
            gps = z["kf_gps"][i]
            gt = z["kf_gt"][i]
            kf = KeyFrame(
                stamp=float(z["kf_stamps"][i]),
                odom=z["kf_odom"][i],
                odom2d=z["kf_odom2d"][i],
                accum_distance=float(z["kf_accum"][i]),
                cloud=make_cloud(z["kf_clouds"][i], capacity=cloud_capacity),
                flat_cloud=make_cloud(z["kf_flat"][i],
                                      capacity=flat_capacity),
                node_id=None if z["kf_node"][i] < 0 else int(z["kf_node"][i]),
                estimated_odom=None if np.isnan(est).any() else est,
                gps_coord=None if np.isnan(gps).any() else gps,
                gt_pose=None if np.isnan(gt).any() else gt,
            )
            self.keyframes.append(kf)
        self.new_keyframes = []
        self.keyframe_queue = []

        if "b_ids" in z.files and self.scale:
            if self.buildings_manager is None:
                self.buildings_manager = BuildingManager(
                    StaticProvider("<osm></osm>"), self.origin, self.scale,
                    radius=self.cfg.nearby_buildings_radius,
                    buffer_radius=self.cfg.buffer_buildings_radius,
                )
            mgr = self.buildings_manager
            mgr.buildings = []
            mgr.buildings_map = {}
            import jax.numpy as jnp

            for i in range(len(z["b_ids"])):
                corners = np.asarray(z["b_corners"][i], float)
                a_pts, b_pts = corners[:-1], corners[1:]
                lines = make_lines(a_pts, b_pts, capacity=mgr.line_capacity)
                a3 = np.concatenate([a_pts, np.zeros((len(a_pts), 1))], 1)
                b3 = np.concatenate([b_pts, np.zeros((len(b_pts), 1))], 1)
                per = max(16, mgr.interpolation_capacity // max(len(a_pts), 1))
                pts, msk = interpolate_segment(
                    jnp.asarray(a3, jnp.float32), jnp.asarray(b3, jnp.float32),
                    capacity=per,
                )
                b = Building(
                    id=str(z["b_ids"][i]), pose=z["b_poses"][i],
                    corners=corners, lines=lines,
                    cloud=MC(pts.reshape(-1, 3), msk.reshape(-1)),
                    node_id=None if z["b_nodes"][i] < 0 else int(z["b_nodes"][i]),
                )
                mgr.buildings.append(b)
                mgr.buildings_map[b.id] = b

    def compute_ate_rpe(self):
        """ATE / t-RPE / r-RPE vs keyframe ground truth (:1204-1280)."""
        from ..utils.metrics import ate_rpe_se2

        poses = self.poses
        kfs = [k for k in self.keyframes if k.gt_pose is not None]
        return ate_rpe_se2([k.estimate(poses) for k in kfs],
                           [k.gt_pose for k in kfs])

    def create_marker_array(self):
        """Viz data mirroring the six marker namespaces (:934-1154)."""
        poses = self.poses
        kf_nodes = np.asarray(
            [k.estimate(poses)[:2] for k in self.keyframes]
        ) if self.keyframes else np.zeros((0, 2))
        b_nodes = (
            np.asarray([
                b.estimate(poses)[:2]
                for b in self.buildings_manager.buildings
            ]) if self.buildings_manager else np.zeros((0, 2))
        )
        edges = []
        for e in self.graph.edges:
            if e["type"] == "se2" and e["j"] is not None:
                edges.append((int(e["i"]), int(e["j"]), int(e["level"])))
        gps = np.asarray([
            k.gps_coord for k in self.keyframes if k.gps_coord is not None
        ]) if self.keyframes else np.zeros((0, 2))
        gt = np.asarray([
            k.gt_pose[:2] for k in self.keyframes if k.gt_pose is not None
        ]) if self.keyframes else np.zeros((0, 2))
        return {
            "keyframe_nodes": kf_nodes,
            "building_nodes": b_nodes,
            "edges": edges,
            "node_xy": (np.asarray([p[:2] for p in self.graph.poses])
                        if self.graph.poses else np.zeros((0, 2))),
            "loop_close_radius": self.loop_detector.distance_thresh,
            "gps": gps,
            "gt_pose": gt,
        }


def _concat_lines(buildings, capacity):
    """Concatenate the buildings' raw outline segments into one masked
    batch, from the host-resident corner polygons (no device fetches:
    b.lines was built from exactly corners[:-1] -> corners[1:],
    buildings/manager.py _new_building)."""
    from ..lines import make_lines

    a_all, b_all = [], []
    for bd in buildings:
        pts = np.asarray(bd.corners, np.float32)
        if len(pts) >= 2:
            a_all.append(pts[:-1])
            b_all.append(pts[1:])
    if not a_all:
        return make_lines(np.zeros((0, 2)), np.zeros((0, 2)), capacity=capacity)
    a = np.concatenate(a_all)[:capacity]
    b = np.concatenate(b_all)[:capacity]
    return make_lines(a, b, capacity=capacity)
