"""Map cloud assembly from keyframe snapshots.

Mirrors MapCloudGenerator (/root/reference/src/hdl_graph_slam/
map_cloud_generator.cpp): concatenate each snapshot's cloud transformed by
its optimized pose, then optionally octree-downsample to occupied-voxel
centers at ``resolution`` (:38-49). Returns numpy (N,3).
"""

import numpy as np
import jax.numpy as jnp

from ..geom.se2 import se2_matrix
from ..ops.cloud import MaskedCloud
from ..ops.voxel import occupied_voxel_centers


class MapCloudGenerator:
    def generate(self, snapshots, resolution=0.05):
        if not snapshots:
            return np.zeros((0, 3))
        parts = []
        for s in snapshots:
            m2 = np.asarray(se2_matrix(jnp.asarray(s.pose)))
            T = np.eye(4)
            T[:2, :2] = m2[:2, :2]
            T[:2, 3] = m2[:2, 2]
            pts = np.asarray(s.cloud.points)
            msk = np.asarray(s.cloud.mask)
            pts = pts[msk]
            parts.append(pts @ T[:3, :3].T + T[:3, 3])
        cloud = np.concatenate(parts, axis=0)
        if resolution and resolution > 0 and len(cloud):
            mc = MaskedCloud(jnp.asarray(cloud, jnp.float32),
                             jnp.ones((len(cloud),), bool))
            out = occupied_voxel_centers(mc, resolution)
            pts = np.asarray(out.points)[np.asarray(out.mask)]
            return pts
        return cloud
