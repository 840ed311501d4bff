"""Pose-graph core: typed edge tables, robust kernels, level-masked sparse LM.

From-scratch replacement for g2o + CHOLMOD/CSparse/PCG
(/root/reference/src/hdl_graph_slam/graph_slam.cpp): vertices and edges are
fixed-capacity arrays, robustified Gauss-Newton/LM normal equations are
assembled by segment-sum, and the linear system is solved either densely
(small graphs) or by block-Jacobi preconditioned CG (matrix-free, shardable
over a device mesh).
"""

from .robust import ROBUST_KERNELS, robust_rho, robust_weight, kernel_id
from .se2_graph import (
    SE2Edges,
    SE2PriorXYEdges,
    SE2PriorYawEdges,
    SE2Graph,
    SE2GraphBuilder,
)
from .solver import optimize_se2, SolverConfig, SolverStats
from .se3_graph import (
    SE3Edges,
    SE3PriorXYEdges,
    SE3PriorXYZEdges,
    SE3PriorVecEdges,
    SE3PriorQuatEdges,
    SE3PlaneEdges,
    SE3Graph,
    SE3GraphBuilder,
)
from .se3_solver import optimize_se3
from .graph_io import save_g2o, load_g2o, save_npz, load_npz

__all__ = [
    "ROBUST_KERNELS", "robust_rho", "robust_weight", "kernel_id",
    "SE2Edges", "SE2PriorXYEdges", "SE2PriorYawEdges", "SE2Graph",
    "SE2GraphBuilder", "optimize_se2", "SolverConfig", "SolverStats",
    "SE3Edges", "SE3PriorXYEdges", "SE3PriorXYZEdges", "SE3PriorVecEdges",
    "SE3PriorQuatEdges", "SE3PlaneEdges", "SE3Graph", "SE3GraphBuilder",
    "optimize_se3",
    "save_g2o", "load_g2o", "save_npz", "load_npz",
]
