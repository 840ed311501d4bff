#!/usr/bin/env python
"""Sweep the 4k/16k SE2 LM configurations for the headline ms/iter.

VERDICT r4 #3: the 4k chain LM sat at ~3 ms/iter for two rounds while
the CPU baseline improved to 23.45 ms/iter (speedup 7.9x < the 10x north
star). Candidate levers, each measured here on the real device:

  - plain chain (the r4 headline config)
  - SPIKE substructuring at p segments (fewer sequential BCR levels:
    log2(N/p) batched over p, interfaces join the Woodbury capacitance)
  - SPIKE + locality-aware sweep (chain_local_cols)

Run:  python scripts/sweep_lm4k.py [n_nodes]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from delta_graph_slam_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache("_dev")

from bench import bench_pose_graph  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rows = [("chain", dict()),
            ("spike p=4", dict(segments=4)),
            ("spike p=8", dict(segments=8)),
            ("spike p=16", dict(segments=16)),
            ("spike p=8 local", dict(segments=8, local_cols=24)),
            ("spike p=16 local", dict(segments=16, local_cols=24))]
    for label, kw in rows:
        t0 = time.perf_counter()
        try:
            ms, iters, chi2, ate = bench_pose_graph(n_nodes=n, **kw)
        except Exception as e:
            print(f"{label:18s} FAILED: {e}", flush=True)
            continue
        print(f"{label:18s} {ms:8.3f} ms/iter  iters={iters:3d} "
              f"chi2={chi2:.4f} ate={ate:.3f} "
              f"(wall {time.perf_counter() - t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
