#!/usr/bin/env python
"""Sweep single-chip solver configurations on the bench graphs.

Times the whole-chain df solve against SPIKE-substructured variants
(segments x local_cols) at 4k and 16k nodes, printing ms/iter and final
chi2/ATE per configuration. Run on the TPU to pick production defaults
(the segmented solve trades sequential BCR levels for batched per-
segment work — the right p/Lc is a hardware question, not an algebra
question; all variants solve the same system to df accuracy).

Usage: python scripts/sweep_solver.py [n_nodes ...]
"""
import sys

sys.path.insert(0, "/root/repo")

from bench import bench_pose_graph  # noqa: E402


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [4096, 16384]
    for n in sizes:
        print(f"--- {n} nodes ---", flush=True)
        ms, iters, chi2, ate = bench_pose_graph(n_nodes=n)
        print(f"chain            {ms:8.3f} ms/iter  iters {iters:3d} "
              f"chi2 {chi2:.4f} ate {ate:.3f}", flush=True)
        for p in (4, 8, 16, 32):
            for lc in (0, 16, 32, 64):
                try:
                    ms, iters, chi2, ate = bench_pose_graph(
                        n_nodes=n, segments=p, local_cols=lc)
                except Exception as e:  # noqa: BLE001 - sweep survives
                    print(f"spike p{p:<3d} Lc{lc:<3d} FAILED: {e}",
                          flush=True)
                    continue
                print(f"spike p{p:<3d} Lc{lc:<3d} {ms:8.3f} ms/iter  "
                      f"iters {iters:3d} chi2 {chi2:.4f} ate {ate:.3f}",
                      flush=True)


if __name__ == "__main__":
    main()
