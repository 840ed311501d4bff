"""Host I/O shim: dataset readers, bag replay, NMEA, PCD, transforms.

The ROS/rosbag surface of the reference is isolated here (BASELINE.json's
"thin host shim"): everything device-side consumes plain arrays.
"""

from .nmea import NmeaSentenceParser, GPRMC
from .pcd import save_pcd, load_pcd
from .bag import Bag, Message, BagPlayer
from .tf_table import TransformTable
from .kitti import load_kitti_velodyne_bin, synthetic_city_sequence

__all__ = [
    "NmeaSentenceParser", "GPRMC", "save_pcd", "load_pcd",
    "Bag", "Message", "BagPlayer", "TransformTable",
    "load_kitti_velodyne_bin", "synthetic_city_sequence",
]
