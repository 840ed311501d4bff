#!/usr/bin/env python
"""Per-stage prefiltering profile on the current jax backend.

Times each stage of the fused prefilter program in isolation (own jit,
honest np.asarray sync) at delta-preset capacities, to locate the
187 ms/frame hotspot (VERDICT round 1, item 4). Run on the TPU:

    python scripts/profile_prefilter.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from delta_graph_slam_tpu import ops
from delta_graph_slam_tpu.io.kitti import synthetic_city_sequence
from delta_graph_slam_tpu.models.prefiltering import (
    PrefilteringConfig, PrefilteringStage,
)


def timeit(label, fn, *args, n=5):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, out
    )
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, out
        )
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{label:38s} {dt:8.2f} ms")
    return out


def main():
    print("platform:", jax.devices()[0].platform)
    cfg = PrefilteringConfig(
        use_distance_filter=True, distance_near_thresh=0.1,
        distance_far_thresh=100.0, downsample_method="VOXELGRID",
        downsample_resolution=0.1, outlier_removal_method="RADIUS",
        radius_radius=0.5, radius_min_neighbors=2,
    )
    _, frames = synthetic_city_sequence(n_frames=3)
    raw = frames[1].points
    # pad to KITTI scale so shapes match the production program
    reps = int(np.ceil(cfg.raw_capacity / len(raw)))
    raw = np.tile(raw, (reps, 1))[: cfg.raw_capacity]
    print(f"raw points: {len(raw)} (capacity {cfg.raw_capacity})")

    cloud = ops.make_cloud(raw, capacity=cfg.raw_capacity)

    dist = jax.jit(lambda c: ops.distance_filter(c, 0.1, 100.0))
    c1 = timeit("distance_filter @131k", dist, cloud)

    vox = jax.jit(lambda c: ops.voxel_downsample(
        c, cfg.downsample_resolution, capacity_out=cfg.out_capacity))
    c3 = timeit("voxel_downsample 131k->32k", vox, c1)

    rad = jax.jit(lambda c: ops.radius_outlier_removal(
        c, cfg.radius_radius, cfg.radius_min_neighbors,
        chunk=cfg.chunk, method="voxel"))
    c4 = timeit("radius_outlier voxel @32k", rad, c3)

    comp = jax.jit(ops.compact)
    c5 = timeit("compact @32k", comp, c4)

    hf = jax.jit(lambda c: ops.height_filter(c, 1.8))
    c6 = timeit("height_filter @32k", hf, c5)

    nf = jax.jit(lambda c: ops.normal_filter(
        c, cfg.normal_filter_thresh, cfg.normal_k,
        viewpoint=(0.0, 0.0, 0.0), keep_vertical_surfaces=True,
        chunk=cfg.chunk, method="voxel"))
    c7 = timeit("normal_filter voxel @32k", nf, c6)

    flat = jax.jit(lambda c: ops.compact(ops.flatten_z(c)))
    timeit("flatten+compact @32k", flat, c7)

    # the real fused program
    stage = PrefilteringStage(cfg)
    t0 = time.perf_counter()
    out = stage.process(raw)
    np.asarray(out.filtered2d.points)
    print(f"{'fused program (compile+run)':38s} "
          f"{(time.perf_counter() - t0) * 1000:8.2f} ms")
    for _ in range(2):
        t0 = time.perf_counter()
        out = stage.process(raw)
        np.asarray(out.filtered2d.points)
        print(f"{'fused program (warm)':38s} "
              f"{(time.perf_counter() - t0) * 1000:8.2f} ms")
    n3 = int(np.asarray(out.filtered3d.mask).sum())
    n2 = int(np.asarray(out.filtered2d.mask).sum())
    print(f"out: filtered3d={n3}, filtered2d={n2}")


if __name__ == "__main__":
    main()
