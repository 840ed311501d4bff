"""Visualization dumps (the rviz-config equivalent for a headless stack).

The reference publishes six MarkerArray namespaces for rviz
(/root/reference/apps/delta_graph_slam_nodelet.cpp:934-1154, config
rviz/delta_graph_slam.rviz). Headless equivalent: write the same content
as JSON + an optional matplotlib figure for quick inspection.
"""

import json

import numpy as np


def dump_markers_json(markers: dict, path):
    def conv(x):
        if isinstance(x, np.ndarray):
            return x.tolist()
        return x

    with open(path, "w") as f:
        json.dump({k: conv(v) for k, v in markers.items()}, f, indent=2)


def plot_markers(markers: dict, path, map_cloud=None):
    """Write a PNG with trajectory, buildings, gps and gt overlays."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return False

    fig, ax = plt.subplots(figsize=(10, 10))
    if map_cloud is not None and len(map_cloud):
        ax.scatter(map_cloud[:, 0], map_cloud[:, 1], s=0.2, c="#cccccc",
                   label="map")
    kf = np.asarray(markers.get("keyframe_nodes", np.zeros((0, 2))))
    if len(kf):
        ax.plot(kf[:, 0], kf[:, 1], "b.-", ms=4, lw=1, label="keyframes")
    bn = np.asarray(markers.get("building_nodes", np.zeros((0, 2))))
    if len(bn):
        ax.plot(bn[:, 0], bn[:, 1], "rs", ms=6, label="buildings")
    gps = np.asarray(markers.get("gps", np.zeros((0, 2))))
    if len(gps):
        ax.plot(gps[:, 0], gps[:, 1], "g^", ms=4, label="gps")
    gt = np.asarray(markers.get("gt_pose", np.zeros((0, 2))))
    if len(gt):
        ax.plot(gt[:, 0], gt[:, 1], "k--", lw=1, label="ground truth")
    ax.set_aspect("equal")
    ax.legend(loc="best")
    ax.set_title("delta_graph_slam_tpu")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return True
