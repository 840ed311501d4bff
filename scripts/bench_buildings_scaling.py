#!/usr/bin/env python
"""Building-count scaling of the backend's per-cycle device work.

VERDICT r2 #10: before a dense-city workload lands, record that the
building-update cycle cost is sublinear in building count. The two
per-cycle device costs that scale with buildings are

  1. align_local_batch — ONE dispatch for all (keyframe x near-building)
     pairs (models/delta_backend.py update_building_nodes; reference
     loops align_local per pair, delta_graph_slam_nodelet.cpp:687), and
  2. the batched polygon-overlap test (get_overlapped_buildings, one
     dispatch for all B*(B-1)/2 pairs; reference check_overlapping.hpp).

This script times both at growing pair counts on the session device and
writes BUILDINGS_SCALING.json. Sublinear means: ms per dispatch grows
far slower than the pair count (the per-pair work is batched onto the
VPU; the host round-trip amortizes).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from delta_graph_slam_tpu.io.kitti import make_city_world
from delta_graph_slam_tpu.buildings import BuildingManager, StaticProvider
from delta_graph_slam_tpu.lines.align import LineBasedScanmatcher
from delta_graph_slam_tpu.config import get_preset


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


def main():
    cfg = get_preset("delta")
    sm = LineBasedScanmatcher(cfg.delta.scanmatcher)

    # a city with enough buildings to draw real line sets from
    world = make_city_world(seed=3, n_buildings=48, extent=500.0)
    mgr = BuildingManager(
        StaticProvider(world.osm_xml()), origin=np.zeros(3),
        scale=world.scale, radius=1e6, buffer_radius=1e6, synchronous=True,
    )
    lat0, lon0 = world.origin_gps
    bs = mgr.get_buildings(lat0, lon0)
    assert len(bs) >= 32, len(bs)

    lines = [b.lines for b in bs]
    cap = lines[0].a.shape[0]

    # scan-side lines: reuse building outlines as stand-in scan features
    scan = lines[0]

    def stack(lst):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *lst)

    rows = []
    for P in (4, 8, 16, 32, 64):
        src = stack([lines[k % len(lines)] for k in range(P)])
        tgt = stack([scan] * P)
        Ts = np.broadcast_to(np.eye(4, dtype=np.float32), (P, 4, 4)).copy()
        res = sm.align_local_batch(src, tgt, Ts, Ts, 0.5)
        sync(res.transformation)                       # compile
        t0 = time.perf_counter()
        n_rep = 5
        for _ in range(n_rep):
            res = sm.align_local_batch(src, tgt, Ts, Ts, 0.5)
            sync(res.transformation)
        ms = (time.perf_counter() - t0) / n_rep * 1000.0
        rows.append({"pairs": P, "align_local_batch_ms": round(ms, 2),
                     "ms_per_pair": round(ms / P, 3)})
        print(rows[-1], flush=True)

    # batched overlap test scaling: all B*(B-1)/2 pairs, one dispatch
    from delta_graph_slam_tpu.lines.overlap import are_buildings_overlapped

    overlap_batch = jax.jit(are_buildings_overlapped)
    ov_rows = []
    for B in (8, 16, 32):
        pairs = [(i, j) for i in range(B) for j in range(i + 1, B)]
        ii = [p[0] for p in pairs]
        jj = [p[1] for p in pairs]
        la = stack([lines[k] for k in ii])
        lb = stack([lines[k] for k in jj])
        ca = jnp.asarray(np.stack([np.asarray(bs[k].pose[:2], np.float32)
                                   for k in ii]))
        cb = jnp.asarray(np.stack([np.asarray(bs[k].pose[:2], np.float32)
                                   for k in jj]))
        out = overlap_batch(la.a, la.b, la.mask, ca,
                            lb.a, lb.b, lb.mask, cb)
        sync(out)
        t0 = time.perf_counter()
        n_rep = 5
        for _ in range(n_rep):
            out = overlap_batch(la.a, la.b, la.mask, ca,
                                lb.a, lb.b, lb.mask, cb)
            sync(out)
        ms = (time.perf_counter() - t0) / n_rep * 1000.0
        ov_rows.append({"buildings": B, "pairs": len(pairs),
                        "overlap_batch_ms": round(ms, 2)})
        print(ov_rows[-1], flush=True)

    out = {
        "platform": jax.devices()[0].platform,
        "align_local_batch": rows,
        "overlap_batch": ov_rows,
        "note": "one device dispatch per cycle regardless of pair count; "
                "sublinear ms growth = batched VPU work amortizing the "
                "host round-trip (reference: one align_local call per "
                "pair, delta_graph_slam_nodelet.cpp:687)",
    }
    with open("/root/repo/BUILDINGS_SCALING.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
