#!/usr/bin/env python
"""Benchmark: end-to-end pipeline + registration + pose-graph LM.

Runs on whatever jax.devices() provides (the driver runs it on one real
TPU chip). Three workloads, all on *distinct consecutive frames* of the
synthetic city world (partial overlap, keyframe swaps — the streaming
shape of the reference's KITTI replay, scan_matching_odometry_nodelet
.cpp:173-270):

  1. e2e_scans_per_sec      — full pipeline (prefilter -> odometry ->
                              delta backend w/ buildings), threaded mode,
                              compile warmup excluded.
  2. odometry scans/sec     — frame-to-keyframe FAST_GICP with the fused
                              one-dispatch/one-fetch status step.
  3. pose-graph LM ms/iter  — SE2 LM at 4k and 16k nodes, PLUS a measured
                              host CPU baseline (scipy-sparse Cholesky LM
                              on the identical graph, the lm_var_cholmod
                              stand-in; launch/delta_graph_slam.launch:81)
                              giving a real lm_speedup_vs_cpu.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline: the reference replays KITTI at 0.1x of the 10 Hz sensor
rate (README.md:29) => ~1 scan/sec end-to-end on the author's CPU;
vs_baseline = e2e_scans_per_sec / 1.0.
"""

import dataclasses
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def _city(n_frames, speed=3.0):
    """Raycast workload (io/lidar_sim.py): occluded 64-beam scans with
    range noise and dropout on the city trajectory — the honest stand-in
    for real velodyne bags (no KITTI data ships in this container). The
    uniform-density point-soup sampler flattered registration
    convergence; headline numbers are measured on raycast geometry."""
    from delta_graph_slam_tpu.io.lidar_sim import raycast_city_sequence

    return raycast_city_sequence(n_frames=n_frames, speed=speed)


def _prefiltered_frames(frames, capacity=16384, seed=0):
    """Prefilter-scale clouds (host-side, untimed prep for the
    registration benchmarks). Raycast scans are beam-major, so a plain
    [:capacity] truncation would keep only the top elevation rings — a
    fixed permutation subsamples uniformly across beams instead."""
    from delta_graph_slam_tpu import ops

    rng = np.random.default_rng(seed)
    out = []
    for fr in frames:
        pts = fr.points
        if len(pts) > capacity:
            pts = pts[rng.permutation(len(pts))[:capacity]]
        out.append(ops.make_cloud(pts[: capacity], capacity=capacity))
    return out


def bench_e2e(n_frames=36, warmup_frames=10):
    """Full delta pipeline scans/sec (prefilter + odometry + backend with
    building alignment + LM), threaded, compile excluded via warmup."""
    from delta_graph_slam_tpu.buildings import StaticProvider
    from delta_graph_slam_tpu.config import get_preset
    from delta_graph_slam_tpu.pipeline.runner import Pipeline

    world, frames = _city(n_frames + warmup_frames)
    cfg = get_preset("delta")
    pipe = Pipeline(cfg, building_provider=StaticProvider(world.osm_xml()),
                    threaded=True)

    # warmup: first frames compile every program (prefilter, align,
    # status, line matcher, LM) — excluded from the timed window
    def drain(n_expected):
        while pipe.frames_processed < n_expected:
            time.sleep(0.005)

    for fr in frames[:warmup_frames]:
        pipe.on_gps(fr.stamp, *fr.gps)
        pipe.on_points(fr.stamp, fr.points, gt_pose=fr.gt_pose)
    drain(warmup_frames)   # timing starts from an idle scan worker
    # compile the whole optimizer cycle (flush/info-matrix/loop/levels/
    # de-overlap) before the clock starts; the solver capacities are
    # preallocated so these programs are the ones the timed cycles reuse
    pipe.backend.optimization_step()
    pipe.backend.optimization_step()

    t0 = time.perf_counter()
    for fr in frames[warmup_frames:]:
        pipe.on_gps(fr.stamp, *fr.gps)
        pipe.on_points(fr.stamp, fr.points, gt_pose=fr.gt_pose)
    drain(warmup_frames + n_frames)
    dt = time.perf_counter() - t0
    pipe.finish()
    stage_ms = {
        k: round(v["mean_ms"], 1) if isinstance(v, dict) else round(v, 1)
        for k, v in pipe.timing_summary().items()
    }
    return n_frames / dt, len(pipe.backend.keyframes), stage_ms


def bench_registration(n_points=16384):
    """Frame-to-keyframe registration over distinct consecutive frames.

    odometry_scans_per_sec: the production odometry stage (keyframe
    swaps, per-frame fused status fetch — the sequential dependency is
    real: the next guess needs this frame's transform).
    aligned_scans_per_sec: streamed aligns of distinct frames against one
    keyframe target, single sync at the end (the pure device-throughput
    ceiling), single-pass and best-of-2.
    """
    from delta_graph_slam_tpu import ops
    from delta_graph_slam_tpu.models.scan_matching_odometry import (
        OdometryConfig, ScanMatchingOdometry,
    )
    from delta_graph_slam_tpu.register import RegistrationConfig, make_registration

    world, frames = _city(44, speed=3.0)
    clouds = _prefiltered_frames(frames, capacity=n_points)

    reg_cfg = RegistrationConfig(
        method="FAST_GICP", transformation_epsilon=0.1,
        maximum_iterations=64, max_correspondence_distance=2.0,
        correspondence_randomness=20, chunk=4096,
    )

    # --- odometry stage (real workload) --------------------------------
    odo = ScanMatchingOdometry(OdometryConfig(
        registration=reg_cfg, keyframe_delta_trans=1.0,
        keyframe_delta_angle=1.0, keyframe_delta_time=10000.0,
    ))
    odo.matching(frames[0].stamp, clouds[0])      # compile + first kf
    odo.matching(frames[1].stamp, clouds[1])      # warm the swap path
    t0 = time.perf_counter()
    n_swaps = 0
    for fr, cl in zip(frames[2:], clouds[2:]):
        f = odo.matching(fr.stamp, cl)
        n_swaps += bool(f.keyframe_swapped)
    odometry_sps = len(frames[2:]) / (time.perf_counter() - t0)

    # trajectory sanity: final odometry pose vs ground truth
    gt = frames[-1].gt_pose - frames[0].gt_pose
    est = f.pose2d
    err_t = float(np.linalg.norm(est[:2] - gt[:2]))

    # --- streamed throughput ceiling ------------------------------------
    reg = make_registration(reg_cfg)
    reg.set_target(clouds[0])
    eye = jnp.eye(4)
    devs = [jnp.asarray(c.points) for c in clouds[1:33]]
    mask = jnp.asarray(clouds[0].mask)
    res = reg.align_cloud(ops.MaskedCloud(devs[0], mask), eye)
    np.asarray(res.transformation)                # compile
    passes = []
    for _ in range(2):
        t0 = time.perf_counter()
        results = [
            reg.align_cloud(ops.MaskedCloud(p, mask), eye) for p in devs
        ]
        conv = np.asarray(jnp.stack([r.converged for r in results]))
        np.asarray(results[-1].transformation)
        passes.append(time.perf_counter() - t0)
    aligned_single = len(devs) / passes[0]
    aligned_best = len(devs) / min(passes)
    conv_rate = float(conv.mean())
    return (odometry_sps, n_swaps, err_t, aligned_single, aligned_best,
            conv_rate)


def _build_bench_graph(n_nodes, rng_seed=7, dtype=np.float32):
    """Realistic SLAM graph: two laps around a circle with noisy odometry,
    vertices initialized by *integrating* that odometry (the only init a
    real frontend has — the graph is consistent, all initial error lives
    in the loop residuals), and genuine lap-to-lap loop closures (node k
    revisits node k + n/2). The drift is observable, so post-solve ATE vs
    ground truth is a meaningful quality metric. Returns (builder, gt)."""
    from delta_graph_slam_tpu.graph import SE2GraphBuilder

    def wrap(a):
        return (a + np.pi) % (2 * np.pi) - np.pi

    def compose(a, m):
        c, s = np.cos(a[2]), np.sin(a[2])
        return np.array([a[0] + c * m[0] - s * m[1],
                         a[1] + s * m[0] + c * m[1], wrap(a[2] + m[2])])

    def rel(a, bb):
        c, s = np.cos(a[2]), np.sin(a[2])
        dx, dy = bb[0] - a[0], bb[1] - a[1]
        return np.array([c * dx + s * dy, -s * dx + c * dy,
                         wrap(bb[2] - a[2])])

    rng = np.random.default_rng(rng_seed)
    lap = n_nodes // 2
    dyaw = 2.0 * np.pi / lap
    gt = np.zeros((n_nodes, 3), np.float64)
    for k in range(1, n_nodes):
        gt[k] = compose(gt[k - 1], [1.0, 0.0, dyaw])
    meas = [rel(gt[k], gt[k + 1]) + rng.normal(0, [0.01, 0.01, 0.002])
            for k in range(n_nodes - 1)]
    init = np.zeros((n_nodes, 3), np.float64)
    init[0] = gt[0]
    for k in range(1, n_nodes):
        init[k] = compose(init[k - 1], meas[k - 1])

    b = SE2GraphBuilder(dtype=dtype)
    info = np.diag([100.0, 100.0, 400.0]).astype(np.float64)
    for k in range(n_nodes):
        b.add_vertex(init[k], fixed=(k == 0))
    for k in range(n_nodes - 1):
        b.add_se2_edge(k, k + 1, meas[k], info)
    for k in range(0, lap - 1, 100):
        m = rel(gt[k], gt[k + lap]) + rng.normal(0, 0.005, 3)
        b.add_se2_edge(k, k + lap, m, info, kernel="Huber", delta=1.0)
    return b, gt


def bench_pose_graph(n_nodes=4096, backend="chain", max_iters=30):
    """TPU LM on the bench graph. The off-chain capacity is bucketed from
    the host-known loop count (off_hint), mirroring the delta backend.
    Returns (ms_per_iter, iters, final_chi2, ate)."""
    from delta_graph_slam_tpu.graph import SolverConfig, optimize_se2

    b, gt = _build_bench_graph(n_nodes)
    chain = backend == "chain"
    g = b.to_arrays(chain_first=chain)
    nc = g.poses.shape[0] - 1 if chain else 0
    cfg = SolverConfig(backend=backend, max_iterations=max_iters)
    hint = b.count_offchain(0)
    poses, stats = optimize_se2(g, level=0, config=cfg, off_hint=hint,
                                n_chain=nc)
    # sync via a scalar fetch: block_until_ready is a no-op on the axon
    # tunnel, which let the remote compile leak into the timed window
    float(stats.chi2_final)

    t0 = time.perf_counter()
    poses, stats = optimize_se2(g, level=0, config=cfg, off_hint=hint,
                                n_chain=nc)
    poses_np = np.asarray(poses)
    dt = time.perf_counter() - t0
    iters = max(int(stats.iterations), 1)
    # solution quality cross-check vs ground truth (gauge: node 0 fixed)
    ate = float(np.mean(np.linalg.norm(
        poses_np[:n_nodes, :2] - gt[:, :2], axis=1
    )))
    return dt * 1000.0 / iters, iters, float(stats.chi2_final), ate


def bench_pose_graph_incremental(n_nodes=16384, chunk=64, backend="chain"):
    """The reference's actual solver regime: the graph grows and is
    re-optimized every cycle warm-started from the previous solution
    (3 s wall-timer, apps/delta_graph_slam_nodelet.cpp:793-927). Grows
    the two-lap graph ``chunk`` keyframes per cycle at fixed capacity
    (one compile) and re-optimizes with a per-cycle LM budget.

    Returns (ms_per_cycle, n_cycles, final_chi2, ate)."""
    from delta_graph_slam_tpu.graph import SolverConfig, optimize_se2
    from delta_graph_slam_tpu.graph.se2_graph import SE2Graph

    full, gt = _build_bench_graph(n_nodes)
    chain = backend == "chain"
    g_full = full.to_arrays(chain_first=chain)
    nc = g_full.poses.shape[0] - 1 if chain else 0
    jax.block_until_ready(g_full.poses)
    vm_host = np.zeros(g_full.poses.shape[0], bool)
    cfg = SolverConfig(backend=backend, max_iterations=8)
    hint = full.count_offchain(0)

    edges_i = np.asarray(g_full.edges.i)
    edges_j = np.asarray(g_full.edges.j)
    edge_hi = np.maximum(edges_i, edges_j) * np.asarray(g_full.edges.mask)

    def sub(nv, poses_dev):
        # active prefix: vertices < nv, edges fully inside the prefix.
        # Same capacities every cycle -> one compiled program.
        vm = jnp.asarray(vm_host | (np.arange(len(vm_host)) < nv))
        emask = jnp.asarray((edge_hi < nv) & np.asarray(g_full.edges.mask))
        return SE2Graph(
            poses_dev, g_full.fixed, vm,
            g_full.edges._replace(mask=emask),
            g_full.priors_xy, g_full.priors_yaw,
        )

    # warm-up compile with the first chunk
    poses = g_full.poses
    p0, st0 = optimize_se2(sub(chunk, poses), level=0, config=cfg,
                           off_hint=hint, n_chain=nc)
    float(st0.chi2_final)   # scalar-fetch sync (tunnel-safe)

    poses = g_full.poses
    cold_chi2 = None
    n_cycles = 0
    t0 = time.perf_counter()
    for nv in range(chunk, n_nodes + 1, chunk):
        # warm start: poses carries the previous cycle's solution; newly
        # activated vertices enter at their odometry-integrated init
        # (exactly what flush_keyframe_queue does)
        p, stats = optimize_se2(sub(nv, poses), level=0, config=cfg,
                                off_hint=hint, n_chain=nc)
        poses = p
        if cold_chi2 is None:
            cold_chi2 = float(stats.chi2_initial)
        n_cycles += 1
    poses_np = np.asarray(poses)
    dt = time.perf_counter() - t0
    final_chi2 = float(stats.chi2_final)
    ate = float(np.mean(np.linalg.norm(
        poses_np[:n_nodes, :2] - gt[:, :2], axis=1
    )))
    return dt * 1000.0 / n_cycles, n_cycles, final_chi2, ate


def _cpu_graph_arrays(b):
    ei = np.asarray([e["i"] for e in b.edges if e["type"] == "se2"])
    ej = np.asarray([e["j"] for e in b.edges if e["type"] == "se2"])
    meas = np.asarray([e["meas"] for e in b.edges if e["type"] == "se2"],
                      np.float64)
    infos = np.asarray([e["info"] for e in b.edges if e["type"] == "se2"],
                       np.float64)
    # kernel_id("Huber") == 1; g2o robustifies only flagged edges
    huber = np.asarray([e["kernel"] == 1 for e in b.edges
                        if e["type"] == "se2"])
    delta = np.asarray([e["delta"] for e in b.edges if e["type"] == "se2"],
                       np.float64)
    return ei, ej, meas, infos, huber, delta


def _cpu_wrap(a):
    return (a + np.pi) % (2 * np.pi) - np.pi


def _cpu_linearize(x, ei, ej, meas):
    """Residual + analytic SE2 jacobians, f64 numpy (E,3[,3])."""
    E = len(ei)
    xi, xj = x[ei], x[ej]
    ci, si = np.cos(xi[:, 2]), np.sin(xi[:, 2])
    cm, sm = np.cos(meas[:, 2]), np.sin(meas[:, 2])
    dx = xj[:, 0] - xi[:, 0]
    dy = xj[:, 1] - xi[:, 1]
    lx = ci * dx + si * dy
    ly = -si * dx + ci * dy
    ex = cm * (lx - meas[:, 0]) + sm * (ly - meas[:, 1])
    ey = -sm * (lx - meas[:, 0]) + cm * (ly - meas[:, 1])
    et = _cpu_wrap(xj[:, 2] - xi[:, 2] - meas[:, 2])
    r = np.stack([ex, ey, et], 1)

    A = np.empty((E, 2, 2))
    A[:, 0, 0] = cm * ci - sm * si
    A[:, 0, 1] = cm * si + sm * ci
    A[:, 1, 0] = -sm * ci - cm * si
    A[:, 1, 1] = -sm * si + cm * ci
    dlx = -si * dx + ci * dy
    dly = -ci * dx - si * dy
    Ji = np.zeros((E, 3, 3))
    Ji[:, :2, :2] = -A
    Ji[:, 0, 2] = cm * dlx + sm * dly
    Ji[:, 1, 2] = -sm * dlx + cm * dly
    Ji[:, 2, 2] = -1.0
    Jj = np.zeros((E, 3, 3))
    Jj[:, :2, :2] = A
    Jj[:, 2, 2] = 1.0
    return r, Ji, Jj


def _cpu_robust(r, infos, huber, delta):
    """g2o Huber: chi2 rho(e2) and IRLS weight rho'(e2) per edge."""
    e2 = np.einsum("ea,eab,eb->e", r, infos, r)
    d2 = delta * delta
    out = huber & (e2 > d2)
    sq = np.sqrt(np.maximum(e2, 1e-30))
    rho = np.where(out, 2.0 * delta * sq - d2, e2)
    w = np.where(out, delta / sq, 1.0)
    return rho.sum(), w


def bench_pose_graph_cpu(n_nodes=4096, max_iters=30):
    """Measured CPU baseline: sparse robust Levenberg-Marquardt with a
    scipy SuperLU solve on the identical graph AND the identical
    objective as the TPU solve — Huber-weighted loop closures, g2o's
    gain-ratio lambda schedule with chi2 accept/reject (the honest
    stand-in for g2o lm_var_cholmod + RobustKernelHuber,
    launch/delta_graph_slam.launch:81, robust_kernel_io.cpp:15-41).
    f64 numpy/scipy only (no jax, no device). Per iteration it does the
    same work as the TPU loop: one linearize, one sparse solve, one
    trial chi2 (whose linearization is carried when accepted).
    Returns (ms_per_iter, iters_used, final_chi2, ate)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl

    b, gt = _build_bench_graph(n_nodes)
    V = len(b.poses)
    x = np.asarray(b.poses, np.float64).copy()
    ei, ej, meas, infos, huber, delta_k = _cpu_graph_arrays(b)
    a3 = np.arange(3)
    rr_ii = np.broadcast_to(
        3 * ei[:, None, None] + a3[None, :, None], (len(ei), 3, 3)).ravel()
    cc_ii = np.broadcast_to(
        3 * ei[:, None, None] + a3[None, None, :], (len(ei), 3, 3)).ravel()
    rr_jj = np.broadcast_to(
        3 * ej[:, None, None] + a3[None, :, None], (len(ej), 3, 3)).ravel()
    cc_jj = np.broadcast_to(
        3 * ej[:, None, None] + a3[None, None, :], (len(ej), 3, 3)).ravel()
    rows = np.concatenate([rr_ii, rr_ii, rr_jj, rr_jj, np.arange(3)])
    cols = np.concatenate([cc_ii, cc_jj, cc_ii, cc_jj, np.arange(3)])

    t0 = time.perf_counter()
    r, Ji, Jj = _cpu_linearize(x, ei, ej, meas)
    chi2, w = _cpu_robust(r, infos, huber, delta_k)
    lam, nu = 1e-5 * 400.0, 2.0
    it = 0
    while it < max_iters:
        Wf = infos * w[:, None, None]
        JiT_W = np.einsum("eba,ebc->eac", Ji, Wf)
        JjT_W = np.einsum("eba,ebc->eac", Jj, Wf)
        Hii = JiT_W @ Ji
        Hij = JiT_W @ Jj
        Hjj = JjT_W @ Jj
        bi = np.einsum("eab,eb->ea", JiT_W, r)
        bj = np.einsum("eab,eb->ea", JjT_W, r)
        Hb = np.zeros(3 * V)
        np.add.at(Hb, (3 * ei[:, None] + a3).ravel(), bi.ravel())
        np.add.at(Hb, (3 * ej[:, None] + a3).ravel(), bj.ravel())
        vals = np.concatenate([
            Hii.ravel(), Hij.ravel(),
            Hij.transpose(0, 2, 1).ravel(), Hjj.ravel(),
            np.full(3, 1e12),  # gauge: clamp vertex 0
        ])
        H = sp.coo_matrix((vals, (rows, cols)), shape=(3 * V, 3 * V)).tocsc()
        H = H + sp.identity(3 * V, format="csc") * lam
        dx = spl.splu(H).solve(-Hb)
        xt = x + dx.reshape(V, 3)
        xt[:, 2] = _cpu_wrap(xt[:, 2])
        rt, Ji_t, Jj_t = _cpu_linearize(xt, ei, ej, meas)
        chi2_t, w_t = _cpu_robust(rt, infos, huber, delta_k)
        denom = np.sum(dx * (lam * dx - Hb))
        rho_g = (chi2 - chi2_t) / max(abs(denom), 1e-30)
        if chi2_t < chi2:
            x, chi2 = xt, chi2_t
            r, Ji, Jj, w = rt, Ji_t, Jj_t, w_t
            lam *= max(1.0 / 3.0, 1.0 - (2 * rho_g - 1) ** 3)
            nu = 2.0
        else:
            lam *= nu
            nu *= 2.0
        it += 1
        if lam > 1e12:
            break
    dt = time.perf_counter() - t0
    ate = float(np.mean(np.linalg.norm(x[:, :2] - gt[:, :2], axis=1)))
    return dt * 1000.0 / it, it, float(chi2), ate


def main():
    platform = jax.devices()[0].platform
    # CPU baselines FIRST: measured 4x inflated when run after the TPU
    # workloads in the same process (tunnel I/O threads steal the core)
    cpu_lm_ms, cpu_iters, cpu_chi2, cpu_ate = bench_pose_graph_cpu()
    cpu_lm_ms_16k, _, cpu_chi2_16k, cpu_ate_16k = bench_pose_graph_cpu(
        n_nodes=16384, max_iters=8
    )
    e2e_sps, n_kf, stage_ms = bench_e2e()
    (odo_sps, n_swaps, err_t, aligned_single, aligned_best,
     conv_rate) = bench_registration()
    lm_ms, lm_iters, lm_chi2, lm_ate = bench_pose_graph()
    lm_ms_16k, _, lm_chi2_16k, lm_ate_16k = bench_pose_graph(n_nodes=16384)
    inc_ms, inc_cycles, inc_chi2, inc_ate = bench_pose_graph_incremental()

    result = {
        "metric": "e2e_scans_per_sec",
        "value": round(e2e_sps, 2),
        "unit": "scans/sec (full delta pipeline: prefilter+odom+backend)",
        # the reference documents 0.1x replay of 10 Hz KITTI => ~1 scan/s
        # effective (README.md:29). That is an ESTIMATE, not a measured
        # number (no ROS/bags in this container) — flagged explicitly:
        "vs_baseline": round(e2e_sps / 1.0, 2),
        "baseline_is_estimated": True,
        "baseline_estimate_source": "reference README.md:29 (0.1x replay)",
        "platform": platform,
        "workload": "raycast_city (io/lidar_sim.py: occluded 64-beam "
                    "scans, range noise, dropout)",
        "e2e_keyframes": n_kf,
        "e2e_stage_ms": stage_ms,
        "odometry_scans_per_sec": round(odo_sps, 2),
        "odometry_keyframe_swaps": n_swaps,
        "odometry_final_err_t_m": round(err_t, 4),
        "aligned_scans_per_sec_single_pass": round(aligned_single, 2),
        "aligned_scans_per_sec_best_of_2": round(aligned_best, 2),
        "convergence_rate": round(conv_rate, 3),
        # -- pose-graph LM: TPU vs CPU on the IDENTICAL robust objective
        # (Huber loop edges, g2o lambda schedule, f64 SuperLU baseline)
        "pose_graph_lm_ms_per_iter": round(lm_ms, 3),
        "pose_graph_nodes": 4096,
        "pose_graph_lm_iters": lm_iters,
        "pose_graph_final_chi2": round(lm_chi2, 4),
        "pose_graph_ate_vs_gt_m": round(lm_ate, 4),
        "pose_graph_16k_lm_ms_per_iter": round(lm_ms_16k, 3),
        "pose_graph_16k_final_chi2": round(lm_chi2_16k, 4),
        "pose_graph_16k_ate_vs_gt_m": round(lm_ate_16k, 4),
        "cpu_robust_lm_ms_per_iter": round(cpu_lm_ms, 3),
        "cpu_robust_lm_final_chi2": round(cpu_chi2, 4),
        "cpu_robust_lm_ate_m": round(cpu_ate, 4),
        "cpu_robust_lm_16k_ms_per_iter": round(cpu_lm_ms_16k, 3),
        "cpu_robust_lm_16k_final_chi2": round(cpu_chi2_16k, 4),
        "cpu_robust_lm_16k_ate_m": round(cpu_ate_16k, 4),
        "lm_speedup_vs_cpu": round(cpu_lm_ms / max(lm_ms, 1e-9), 2),
        "lm_16k_speedup_vs_cpu": round(cpu_lm_ms_16k / max(lm_ms_16k, 1e-9), 2),
        # -- warm-started incremental regime (the reference's 3 s cadence,
        # delta_graph_slam_nodelet.cpp:793-927)
        "incremental_ms_per_cycle": round(inc_ms, 3),
        "incremental_cycles": inc_cycles,
        "incremental_nodes": 16384,
        "incremental_final_chi2": round(inc_chi2, 4),
        "incremental_ate_vs_gt_m": round(inc_ate, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
