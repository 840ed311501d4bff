"""Multi-chip scaling over a jax.sharding.Mesh.

The reference is a single-process system (SURVEY.md section 2.b); the
TPU-native scaling axes are:

- ``dp`` (data parallel): batched scan registration — many (source,
  target, guess) problems vmapped into one program and sharded over the
  mesh (multi-bag replay, loop-closure candidate validation,
  BASELINE.json config 5).
- ``mp`` (model parallel): the pose-graph solve for 10k+-node graphs —
  edge tables sharded over devices; the CG matvec's segment-sums become
  psums inserted by GSPMD, so the Hessian-free solve rides ICI
  collectives without any hand-written communication.
"""

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.se2_graph import SE2Graph
from ..graph.solver import SolverConfig, _make_optimize
from ..register.engine import SourceModel, TargetModel, _make_align_fn
from ..register.config import RegistrationConfig


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              mp: int = 1) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    dp = dp or (n // mp)
    assert dp * mp == n, f"dp({dp}) * mp({mp}) != n({n})"
    arr = np.asarray(devs).reshape(dp, mp)
    return Mesh(arr, ("dp", "mp"))


# ------------------------------------------------------- batched alignment

def batched_align(cfg: RegistrationConfig):
    """vmapped align: (stacked SourceModel, TargetModel, guesses (B,4,4))
    -> batched RegistrationResult. One compiled program for B problems."""
    align = _make_align_fn(cfg)
    return jax.jit(jax.vmap(align))


def batched_align_sharded(cfg: RegistrationConfig, mesh: Mesh):
    """Data-parallel batched align: batch axis sharded over the 'dp' axis."""
    align = jax.vmap(_make_align_fn(cfg))
    batch_sharding = NamedSharding(mesh, P("dp"))

    def shard_tree(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh, P(*(("dp",) + (None,) * (x.ndim - 1))))
            ),
            tree,
        )

    fn = jax.jit(align)

    def run(srcs: SourceModel, tgts: TargetModel, guesses):
        return fn(shard_tree(srcs), shard_tree(tgts), shard_tree(guesses))

    run.sharding = batch_sharding
    return run


# ------------------------------------------------------ sharded graph solve

def shard_graph_edges(graph: SE2Graph, mesh: Mesh, axis: str = "mp") -> SE2Graph:
    """Place edge tables sharded along the edge axis; vertices replicated.

    GSPMD then partitions the per-edge work (residuals, Jacobians, matvec
    products) across devices and inserts all-reduces for the vertex-indexed
    segment-sums — the block-row-parallel Hessian-free solve.
    """
    n_ax = mesh.shape[axis]

    def shard_edges(x):
        # pad edge axis to a multiple of the mesh axis
        pad = (-x.shape[0]) % n_ax
        if pad:
            cfg = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            x = jnp.pad(x, cfg)
        spec = P(*((axis,) + (None,) * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    def repl(x):
        return jax.device_put(x, NamedSharding(mesh, P()))

    def shard_table(t):
        return type(t)(*(shard_edges(v) for v in t))

    return SE2Graph(
        poses=repl(graph.poses),
        fixed=repl(graph.fixed),
        vmask=repl(graph.vmask),
        edges=shard_table(graph.edges),
        priors_xy=shard_table(graph.priors_xy),
        priors_yaw=shard_table(graph.priors_yaw),
    )


_SHARDED_CACHE = {}


def optimize_se2_sharded(graph: SE2Graph, mesh: Mesh, level=0,
                         config: SolverConfig = None, axis: str = "mp",
                         n_chain=0, off_hint=None):
    """Level-masked LM sharded across the mesh axis.

    backend='cg': edge tables sharded; GSPMD turns the Hessian-free
    matvec's segment-sums into psums (the historical path — measured to
    under-converge on ill-conditioned graphs, NOTES_r2).

    backend='chain' (+ n_chain for the chain-first layout): the direct
    df solver with SPIKE substructuring (parallel/spike.py) — the chain
    splits into mesh.shape[axis] segments factored independently per
    device; interfaces + loop closures go through one small replicated
    Woodbury capacitance. Numerically identical to the single-chip chain
    solve, and it CONVERGES (VERDICT r2 #5).
    """
    import dataclasses as _dc

    from ..graph.solver import optimize_se2

    config = config or SolverConfig()
    if config.backend == "chain":
        config = _dc.replace(
            config, chain_segments=mesh.shape[axis], chain_mesh_axis=axis,
        )
        with mesh:
            return optimize_se2(graph, level=level, config=config,
                                off_hint=off_hint, n_chain=n_chain)
    key = (config, mesh.shape[axis])
    if key not in _SHARDED_CACHE:
        _SHARDED_CACHE[key] = jax.jit(_make_optimize(config))
    g = shard_graph_edges(graph, mesh, axis)
    with mesh:
        return _SHARDED_CACHE[key](g, jnp.asarray(level, jnp.int32))
