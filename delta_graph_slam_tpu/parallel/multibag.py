"""Batched multi-bag scan-matching odometry (BASELINE.json config 5).

Runs B independent odometry pipelines in lockstep: every frame, all B
(source, keyframe-target, guess) problems execute as ONE vmapped device
program, optionally sharded over the mesh 'dp' axis. Keyframe swaps are
per-bag host decisions; only swapped bags rebuild their target model
(stacked back with a scatter into the batched pytree).

This is the TPU-native replacement for "run the reference N times": the
same registration program, batched to fill the chip (or the pod slice).
"""

from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from ..geom.se3 import transform_3d_to_2d
from ..ops.cloud import MaskedCloud
from ..register import RegistrationConfig, make_registration
from ..register.engine import _make_align_fn


def _stack(trees):
    return jax.tree_util.tree_map(lambda *a: jnp.stack(a), *trees)


def _set_slice(batched, idx, tree):
    return jax.tree_util.tree_map(
        lambda b, t: b.at[idx].set(t), batched, tree
    )


class MultiBagOdometry:
    """Lockstep frame-to-keyframe odometry over B bags."""

    def __init__(self, cfg: RegistrationConfig, n_bags: int,
                 keyframe_delta_trans=0.25, keyframe_delta_angle=0.15,
                 mesh=None):
        self.cfg = cfg
        self.n_bags = n_bags
        self.keyframe_delta_trans = keyframe_delta_trans
        self.keyframe_delta_angle = keyframe_delta_angle
        self.reg = make_registration(cfg)
        self._align_batched = jax.jit(jax.vmap(_make_align_fn(cfg)))
        self.mesh = mesh

        self.targets = None             # stacked TargetModel (B, ...)
        self.keyframe_poses = np.tile(np.eye(4), (n_bags, 1, 1))
        self.prev_trans = np.tile(np.eye(4), (n_bags, 1, 1))
        self.initialized = np.zeros(n_bags, bool)

    def _shard(self, tree):
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x,
                NamedSharding(
                    self.mesh, P(*(("dp",) + (None,) * (x.ndim - 1)))
                ),
            ),
            tree,
        )

    def process(self, clouds: List[MaskedCloud]):
        """One lockstep frame for all bags. Returns (B,4,4) odometry poses."""
        assert len(clouds) == self.n_bags
        if self.targets is None:
            self.targets = self._shard(
                _stack([self.reg.build_target(c) for c in clouds])
            )
            self.initialized[:] = True
            return self.keyframe_poses.copy()

        srcs = self._shard(_stack([self.reg.build_source(c) for c in clouds]))
        guesses = jnp.asarray(self.prev_trans, jnp.float32)
        res = self._align_batched(srcs, self.targets, guesses)
        trans = np.asarray(res.transformation, np.float64)
        odom = np.einsum("bij,bjk->bik", self.keyframe_poses, trans)

        # per-bag keyframe swap (host decision, device rebuild per swapped bag)
        swapped = []
        for b in range(self.n_bags):
            dt = np.linalg.norm(trans[b, :3, 3])
            qw = np.clip(
                np.sqrt(max(0.0, 1.0 + np.trace(trans[b, :3, :3]))) / 2, -1, 1
            )
            da = np.arccos(qw)
            if dt > self.keyframe_delta_trans or da > self.keyframe_delta_angle:
                swapped.append(b)
        if swapped:
            for b in swapped:
                t = self.reg.build_target(clouds[b])
                self.targets = _set_slice(self.targets, b, t)
                self.keyframe_poses[b] = odom[b]
                self.prev_trans[b] = np.eye(4)
        for b in range(self.n_bags):
            if b not in swapped:
                self.prev_trans[b] = trans[b]
        return odom

    def poses2d(self, odom):
        return np.asarray(transform_3d_to_2d(jnp.asarray(odom)))
