"""Profile the line scanmatcher — the e2e critical path (VERDICT r3 #2).

align_global (~2 s/keyframe in the r3 e2e bench, derived from the
backend_enqueue stage mean) decomposes into:
  1. line_extraction      ransac_line: max_lines sequential RANSAC
                          fits, each with an O(N^2 / chunk) euclidean
                          clustering sweep (ops/ransac.py)
  2. merge_target_lines   host-side collinear merge + re-upload
  3. edge_extraction x2   pairwise corner intersections
  4. _global_fn           candidate scoring (chunked lax.map)

This script times each on the production shapes (raycast city flat
cloud at the delta preset capacity, StaticProvider building lines) so
optimization goes where the milliseconds are. Run on the TPU:

    python scripts/profile_lines.py [n_frames]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax


def _sync(x):
    """Honest sync through the axon tunnel: fetch one dependent scalar."""
    leaves = jax.tree_util.tree_leaves(x)
    for leaf in leaves:
        if hasattr(leaf, "dtype") and leaf.dtype.kind == "f":
            float(leaf.ravel()[0])
            return


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    from delta_graph_slam_tpu.buildings import StaticProvider
    from delta_graph_slam_tpu.config import get_preset
    from delta_graph_slam_tpu.lines.align import LineBasedScanmatcher
    from delta_graph_slam_tpu.lines.features import edge_extraction
    from delta_graph_slam_tpu.models.prefiltering import PrefilteringStage
    from delta_graph_slam_tpu.io.lidar_sim import raycast_city_sequence
    from delta_graph_slam_tpu.models.delta_backend import _concat_lines

    from delta_graph_slam_tpu.buildings.manager import BuildingManager
    from delta_graph_slam_tpu.geom.projection import mercator_from_gps

    world, frames = raycast_city_sequence(n_frames=n_frames, speed=3.0)
    cfg = get_preset("delta")
    pre = PrefilteringStage(cfg.prefiltering)
    sm = LineBasedScanmatcher(cfg.delta.scanmatcher)
    lat0, lon0 = frames[0].gps[:2]
    scale = float(np.cos(np.radians(lat0)))
    origin = np.asarray(mercator_from_gps(np.float64(lat0),
                                          np.float64(lon0), 0.0, scale=scale))
    mgr = BuildingManager(StaticProvider(world.osm_xml()), origin, scale,
                          synchronous=True)
    buildings = mgr.get_buildings(lat0, lon0)
    print(f"buildings: {len(buildings)}", flush=True)

    blines = _concat_lines(buildings,
                           capacity=cfg.delta.scanmatcher.max_target_lines)

    stages = {}

    def timeit(name, fn, warmup=1, reps=None):
        outs = None
        for _ in range(warmup):
            outs = fn(0)
            _sync(outs)
        ts = []
        idxs = range(1, n_frames) if reps is None else range(reps)
        for k in idxs:
            t0 = time.perf_counter()
            outs = fn(k % n_frames)
            _sync(outs)
            ts.append(time.perf_counter() - t0)
        stages[name] = 1000.0 * float(np.mean(ts))
        print(f"{name:24s} {stages[name]:9.1f} ms "
              f"(n={len(ts)}, min {1000 * min(ts):.1f})", flush=True)
        return outs

    clouds = [pre.process(fr.points).filtered2d for fr in frames]
    _sync(clouds[-1])

    src_lines = [None] * n_frames
    def f_extract(k):
        src_lines[k] = sm.line_extraction(clouds[k])
        return src_lines[k]
    timeit("line_extraction", f_extract)

    def f_merge(k):
        return sm.merge_target_lines(blines)
    trg = timeit("merge_target_lines", f_merge)

    def f_edges_src(k):
        return edge_extraction(src_lines[k], capacity=cfg.delta.scanmatcher.edge_capacity)
    timeit("edge_extraction(src)", f_edges_src)

    def f_edges_trg(k):
        return edge_extraction(trg, capacity=cfg.delta.scanmatcher.target_edge_capacity)
    te = timeit("edge_extraction(trg)", f_edges_trg)

    se_list = [edge_extraction(s, capacity=cfg.delta.scanmatcher.edge_capacity)
               for s in src_lines]

    def f_score(k):
        return sm._global_fn(src_lines[k], trg, se_list[k], te, True, 3.5)
    timeit("global_fn(score)", f_score)

    def f_full(k):
        return sm.align_global(clouds[k], blines, constrain_angle=True,
                               max_range=3.5)
    timeit("align_global(full)", f_full)

    total = sum(v for k, v in stages.items() if k != "align_global(full)")
    print(f"{'sum of parts':24s} {total:9.1f} ms")


if __name__ == "__main__":
    main()
