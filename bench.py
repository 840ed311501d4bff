#!/usr/bin/env python
"""Benchmark: scans/sec registered + pose-graph LM ms/iter (BASELINE.json).

Runs on whatever jax.devices() provides (the driver runs it on one real
TPU chip). Workload mirrors the KITTI 0027 configuration: FAST_GICP
frame-to-keyframe registration on prefiltered-scale clouds, plus the SE2
pose-graph LM solve at delta-launch scale.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline: the reference replays KITTI at 0.1x of the 10 Hz sensor rate
(README.md:29) => ~1 scan/sec end-to-end on the author's CPU; the
north-star target is >=10 Hz (BASELINE.md). vs_baseline = scans_per_sec /
1.0 (ratio vs the reference's effective rate).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def make_scene(seed, n=16384, extent=60.0):
    """Structured lidar-like scene: ground + walls at KITTI-filtered scale."""
    rng = np.random.default_rng(seed)
    n_ground = n // 3
    n_wall = n - n_ground
    ground = np.stack([
        rng.uniform(-extent, extent, n_ground),
        rng.uniform(-extent, extent, n_ground),
        np.zeros(n_ground),
    ], 1)
    # several walls
    walls = []
    per = n_wall // 8
    for k in range(8):
        ang = k * np.pi / 4
        c, s = np.cos(ang), np.sin(ang)
        along = rng.uniform(-extent / 2, extent / 2, per)
        d = rng.uniform(10, extent, 1)[0]
        x = c * d - s * along
        y = s * d + c * along
        z = rng.uniform(0, 5, per)
        walls.append(np.stack([x, y, z], 1))
    pts = np.concatenate([ground] + walls)
    if len(pts) < n:  # integer-division remainder: repeat a few points
        pts = np.concatenate([pts, pts[: n - len(pts)]])
    pts = pts[:n] + rng.normal(0, 0.01, (n, 3))
    return pts.astype(np.float32)


def bench_registration(n_frames=40, n_points=16384):
    from delta_graph_slam_tpu import ops
    from delta_graph_slam_tpu.register import RegistrationConfig, make_registration
    from delta_graph_slam_tpu.geom import se3_exp

    cfg = RegistrationConfig(
        method="FAST_GICP", transformation_epsilon=0.1,
        maximum_iterations=64, max_correspondence_distance=2.0,
        correspondence_randomness=20, chunk=4096,
    )
    reg = make_registration(cfg)

    target_pts = make_scene(0, n_points)
    target = reg.build_target(ops.make_cloud(target_pts))

    # pre-build all sources (covariance build is part of the per-scan cost)
    rng = np.random.default_rng(1)
    xi = np.concatenate([
        rng.uniform(-0.3, 0.3, (n_frames, 3)),
        rng.uniform(-0.03, 0.03, (n_frames, 3)),
    ], 1)
    Ts = np.asarray(se3_exp(jnp.asarray(xi, jnp.float32)))
    sources_np = [
        (target_pts @ T[:3, :3].T + T[:3, 3]).astype(np.float32) for T in Ts
    ]

    reg.set_target(ops.make_cloud(target_pts))
    mask = jnp.ones((n_points,), bool)
    eye = jnp.eye(4)
    sources_dev = [jnp.asarray(p) for p in sources_np]

    # warmup (compile)
    res = reg.align_cloud(ops.MaskedCloud(sources_dev[0], mask), eye)
    np.asarray(res.transformation)

    # latency: per-scan host sync (the worst-case interactive path)
    t0 = time.perf_counter()
    for pts in sources_dev[:10]:
        res = reg.align_cloud(ops.MaskedCloud(pts, mask), eye)
        np.asarray(res.transformation)
    latency_ms = (time.perf_counter() - t0) / 10 * 1000.0

    # throughput: streamed scans, one sync at the end (production replay);
    # best of two passes (the tunneled dev TPU has bursty RTT noise)
    best_dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        results = [
            reg.align_cloud(ops.MaskedCloud(pts, mask), eye)
            for pts in sources_dev
        ]
        conv = np.asarray(jnp.stack([r.converged for r in results]))
        np.asarray(results[-1].transformation)
        best_dt = min(best_dt, time.perf_counter() - t0)
    scans_per_sec = n_frames / best_dt
    n_ok = int(conv.sum())

    # accuracy sanity on the last frame
    T_est = np.asarray(results[-1].transformation)
    T_true = np.linalg.inv(Ts[-1])
    err_t = float(np.linalg.norm(T_est[:3, 3] - T_true[:3, 3]))
    return scans_per_sec, latency_ms, n_ok / n_frames, err_t


def bench_pose_graph(n_nodes=4096, cg_max_iters=50, cg_rtol=1e-5):
    from delta_graph_slam_tpu.graph import SE2GraphBuilder, SolverConfig, optimize_se2

    rng = np.random.default_rng(7)
    b = SE2GraphBuilder(dtype=np.float32)
    # long trajectory with loop closures (delta-launch scale and beyond)
    gt = np.zeros((n_nodes, 3), np.float32)
    for k in range(1, n_nodes):
        gt[k] = gt[k - 1] + [1.0 * np.cos(gt[k - 1, 2]),
                             1.0 * np.sin(gt[k - 1, 2]),
                             rng.normal(0, 0.02)]
    for k in range(n_nodes):
        noisy = gt[k] + rng.normal(0, 0.1, 3) * (k > 0)
        b.add_vertex(noisy, fixed=(k == 0))
    info = np.diag([100.0, 100.0, 400.0]).astype(np.float32)

    def rel(a, bb):
        c, s = np.cos(a[2]), np.sin(a[2])
        dx, dy = bb[0] - a[0], bb[1] - a[1]
        return np.array([c * dx + s * dy, -s * dx + c * dy, bb[2] - a[2]],
                        np.float32)

    for k in range(n_nodes - 1):
        b.add_se2_edge(k, k + 1, rel(gt[k], gt[k + 1]), info)
    # loop closures every 100 nodes
    for k in range(0, n_nodes - 200, 100):
        b.add_se2_edge(k, k + 150, rel(gt[k], gt[k + 150]), info,
                       kernel="Huber", delta=1.0)
    g = b.to_arrays()

    cfg = SolverConfig(backend="cg", max_iterations=30,
                       cg_max_iters=cg_max_iters, cg_rtol=cg_rtol)
    poses, stats = optimize_se2(g, level=0, config=cfg)  # warmup/compile
    jax.block_until_ready(poses)

    t0 = time.perf_counter()
    poses, stats = optimize_se2(g, level=0, config=cfg)
    jax.block_until_ready(poses)
    dt = time.perf_counter() - t0
    iters = max(int(stats.iterations), 1)
    ms_per_iter = dt * 1000.0 / iters
    return ms_per_iter, iters, float(stats.chi2_final / max(float(stats.chi2_initial), 1e-9))


def main():
    platform = jax.devices()[0].platform
    scans_per_sec, latency_ms, conv_rate, err_t = bench_registration()
    lm_ms, lm_iters, chi2_ratio = bench_pose_graph()
    lm_ms_16k, _, chi2_16k = bench_pose_graph(n_nodes=16384)

    # reference baseline: ~1 scan/sec effective (0.1x replay of 10 Hz KITTI)
    result = {
        "metric": "scans_per_sec_registered",
        "value": round(scans_per_sec, 2),
        "unit": "scans/sec (16k-pt FAST_GICP, cov build + align)",
        "vs_baseline": round(scans_per_sec / 1.0, 2),
        "platform": platform,
        "scan_latency_ms": round(latency_ms, 2),
        "convergence_rate": round(conv_rate, 3),
        "last_frame_err_t_m": round(err_t, 4),
        "pose_graph_lm_ms_per_iter": round(lm_ms, 3),
        "pose_graph_nodes": 4096,
        "pose_graph_lm_iters": lm_iters,
        "pose_graph_chi2_reduction": round(chi2_ratio, 6),
        "pose_graph_16k_lm_ms_per_iter": round(lm_ms_16k, 3),
        "pose_graph_16k_chi2_reduction": round(chi2_16k, 6),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
