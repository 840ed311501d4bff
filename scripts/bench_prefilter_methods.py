#!/usr/bin/env python
"""Compare prefilter neighbor backends (voxel vs dense) on the live backend.

Honest device timing on the axon tunnel: block_until_ready() is a no-op
there and bulk fetch runs ~2 MB/s, so each timed call is synced by
fetching ONE scalar that depends on every output (mask popcounts). The
raw scan is uploaded once outside the loop so the number is device
compute, not tunnel bandwidth.

    PYTHONPATH=/root/.axon_site python scripts/bench_prefilter_methods.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from delta_graph_slam_tpu import ops
from delta_graph_slam_tpu.io.lidar_sim import raycast_sequence
from delta_graph_slam_tpu.models.prefiltering import (
    PrefilteringConfig, _build_fn,
)


def main():
    print("platform:", jax.devices()[0].platform)
    _, frames = raycast_sequence(n_frames=2, seed=3)
    raw = frames[1][2].astype(np.float32)
    print(f"raycast scan: {len(raw)} points")

    for method in ("voxel", "dense"):
        cfg = PrefilteringConfig(
            distance_near_thresh=0.1, radius_radius=0.5,
            neighbor_method=method,
        )
        fn = _build_fn(cfg)

        def step(cloud, base_T, h, ang):
            out = fn(cloud, base_T, h, ang, False)
            sync = (out.filtered3d.mask.sum().astype(jnp.int32)
                    + out.filtered2d.mask.sum().astype(jnp.int32))
            return out, sync

        jstep = jax.jit(step)
        cloud = jax.device_put(ops.make_cloud(raw, capacity=cfg.raw_capacity))
        base_T = jax.device_put(jnp.eye(4, dtype=jnp.float32))
        ang = jax.device_put(jnp.zeros(3, jnp.float32))
        out, sync = jstep(cloud, base_T, 1.8, ang)  # compile
        int(sync)
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            out, sync = jstep(cloud, base_T, 1.8, ang)
        s = int(sync)
        dt = (time.perf_counter() - t0) / n * 1000
        print(f"{method:6s}: {dt:8.2f} ms/frame   (kept3d+2d={s})")


if __name__ == "__main__":
    main()
