"""Scan-match fitness -> SE2 information matrices.

Replicates InformationMatrixCalculator
(/root/reference/src/hdl_graph_slam/information_matrix_calculator.cpp):

- calc_fitness_score: mean squared distance of cloud2 (transformed by
  relpose) to its 1-NN in cloud1, gated by max_range (:77-108);
- calc_information_matrix: saturating-exponential weight() maps fitness to
  [min_var, max_var]; info = diag(1/w_x, 1/w_x, 1/w_q) (:53-75). NB the
  reference divides by the *variance-valued* weight here and by the raw
  stddev in the const path (:54-58) — both reproduced;
- buildings_global: same / importance_ratio_global (:110-132);
- buildings_local: sigmoid b_weight of line-fit distance, x edge bonus,
  x coverage% (:134-157).
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import nn_1


def _fitness_core(points1, mask1, points2, mask2, T, max_range):
    T = jnp.asarray(T, points2.dtype)
    moved = points2 @ T[:3, :3].T + T[:3, 3]
    d2, _ = nn_1(moved, mask2, points1, mask1)
    # reference quirk (information_matrix_calculator.cpp:96, PCL
    # getFitnessScore): the SQUARED NN distance is compared to the
    # un-squared max_range, so points up to sqrt(max_range) are accepted.
    ok = mask2 & jnp.isfinite(d2) & (d2 <= max_range)
    nr = jnp.sum(ok)
    s = jnp.sum(jnp.where(ok, d2, 0.0))
    return jnp.where(nr > 0, s / jnp.maximum(nr, 1), jnp.inf), nr


_fitness = jax.jit(_fitness_core)


def _fitness_many(items):
    """Fitness for many (cloud1, cloud2, T) pairs with ONE host fetch.

    Dispatches the already-compiled single-pair program asynchronously
    per pair and syncs once on the stacked scalars — the per-pair
    float() fetch (a ~30 ms tunnel round-trip each) was the real cost of
    a flush cycle, not the compute. (A vmapped batch variant was tried
    and rejected: it multiplies the nn_1 chunk buffer by the batch axis
    and compiles one giant program per pow2 bucket.)"""
    outs = []
    for c1, c2, T in items:
        f, _ = _fitness(c1.points, c1.mask, c2.points, c2.mask,
                        np.asarray(T), float("inf"))
        outs.append(f)
    return np.asarray(jnp.stack(outs))


def fitness_score(cloud1, cloud2, relpose, max_range=float("inf")):
    """Mean squared 1-NN distance of cloud2@relpose against cloud1."""
    f, _ = _fitness(
        cloud1.points, cloud1.mask, cloud2.points, cloud2.mask,
        np.asarray(relpose), max_range,
    )
    return float(f)


@dataclasses.dataclass
class InformationMatrixCalculator:
    use_const_inf_matrix: bool = False
    const_stddev_x: float = 0.5
    const_stddev_q: float = 0.1
    var_gain_a: float = 20.0
    min_stddev_x: float = 0.1
    max_stddev_x: float = 5.0
    min_stddev_q: float = 0.05
    max_stddev_q: float = 0.2
    fitness_score_thresh: float = 0.5
    b_var_gain_a: float = 20.0
    b_min_stddev_x: float = 0.1
    b_max_stddev_x: float = 5.0
    b_min_stddev_q: float = 0.05
    b_max_stddev_q: float = 0.2
    b_avg_fitness_score: float = 0.5
    b_importance_ratio_global: float = 1.0
    b_importance_ratio_local: float = 1.0

    @staticmethod
    def weight(a, max_x, min_y, max_y, x):
        y = (1.0 - math.exp(-a * x)) / (1.0 - math.exp(-a * max_x))
        return min_y + (max_y - min_y) * y

    @staticmethod
    def b_weight(a, avg_x, min_y, max_y, x):
        e = math.exp(a * (x - avg_x))
        y = e / (e + 1.0)
        return min_y + (max_y - min_y) * y

    def _weighted_info(self, fitness):
        min_var_x = self.min_stddev_x**2
        max_var_x = self.max_stddev_x**2
        min_var_q = self.min_stddev_q**2
        max_var_q = self.max_stddev_q**2
        w_x = self.weight(self.var_gain_a, self.fitness_score_thresh,
                          min_var_x, max_var_x, fitness)
        w_q = self.weight(self.var_gain_a, self.fitness_score_thresh,
                          min_var_q, max_var_q, fitness)
        return np.diag([1.0 / w_x, 1.0 / w_x, 1.0 / w_q])

    def calc_information_matrix(self, cloud1, cloud2, relpose):
        if self.use_const_inf_matrix:
            # reference quirk: const path divides by stddev, not variance
            return np.diag([
                1.0 / self.const_stddev_x, 1.0 / self.const_stddev_x,
                1.0 / self.const_stddev_q,
            ])
        f = fitness_score(cloud1, cloud2, relpose)
        return self._weighted_info(f)

    def calc_information_matrices(self, items):
        """Batched calc_information_matrix: items = [(cloud1, cloud2,
        relpose 4x4), ...] -> list of (3,3) infos. All pair fitnesses are
        dispatched asynchronously and fetched once (_fitness_many)."""
        if not items:
            return []
        if self.use_const_inf_matrix:
            one = np.diag([
                1.0 / self.const_stddev_x, 1.0 / self.const_stddev_x,
                1.0 / self.const_stddev_q,
            ])
            return [one.copy() for _ in items]
        fs = _fitness_many(items)
        return [self._weighted_info(float(f)) for f in fs]

    def calc_information_matrix_se3(self, cloud1, cloud2, relpose):
        """6-DoF variant as used with SE3 edges upstream
        (information_matrix_calculator.cpp:53-75): one translational
        weight on all three axes, one rotational weight on all three."""
        if self.use_const_inf_matrix:
            return np.diag(
                [1.0 / self.const_stddev_x] * 3
                + [1.0 / self.const_stddev_q] * 3
            )
        f = fitness_score(cloud1, cloud2, relpose)
        w_x = self.weight(self.var_gain_a, self.fitness_score_thresh,
                          self.min_stddev_x**2, self.max_stddev_x**2, f)
        w_q = self.weight(self.var_gain_a, self.fitness_score_thresh,
                          self.min_stddev_q**2, self.max_stddev_q**2, f)
        return np.diag([1.0 / w_x] * 3 + [1.0 / w_q] * 3)

    def calc_information_matrices_se3(self, items):
        """Batched calc_information_matrix_se3 (one dispatch + fetch)."""
        if not items:
            return []
        if self.use_const_inf_matrix:
            one = np.diag([1.0 / self.const_stddev_x] * 3
                          + [1.0 / self.const_stddev_q] * 3)
            return [one.copy() for _ in items]
        fs = _fitness_many(items)
        out = []
        for f in fs:
            w_x = self.weight(self.var_gain_a, self.fitness_score_thresh,
                              self.min_stddev_x**2, self.max_stddev_x**2,
                              float(f))
            w_q = self.weight(self.var_gain_a, self.fitness_score_thresh,
                              self.min_stddev_q**2, self.max_stddev_q**2,
                              float(f))
            out.append(np.diag([1.0 / w_x] * 3 + [1.0 / w_q] * 3))
        return out

    def calc_information_matrix_buildings_global(self, fitness):
        if self.use_const_inf_matrix:
            return np.diag([
                1.0 / self.const_stddev_x, 1.0 / self.const_stddev_x,
                1.0 / self.const_stddev_q,
            ])
        return self._weighted_info(fitness) / self.b_importance_ratio_global

    def calc_information_matrix_buildings_local(
        self, avg_distance, coverage_percentage, is_edge_aligned
    ):
        b_min_var_x = self.b_min_stddev_x**2
        b_max_var_x = self.b_max_stddev_x**2
        b_min_var_q = self.b_min_stddev_q**2
        b_max_var_q = self.b_max_stddev_q**2
        w_x = self.b_weight(self.b_var_gain_a, self.b_avg_fitness_score,
                            b_min_var_x, b_max_var_x, avg_distance)
        w_q = self.b_weight(self.b_var_gain_a, self.b_avg_fitness_score,
                            b_min_var_q, b_max_var_q, avg_distance)
        inf = np.diag([1.0 / w_x, 1.0 / w_x, 1.0 / w_q])
        if is_edge_aligned:
            inf = inf * self.b_importance_ratio_local
        return inf * (coverage_percentage / 100.0)
