"""Host runtime: keyframes, admission, loop detection, information matrices,
bounded queues with watermark flow control."""

from .keyframe import KeyFrame, KeyFrameSnapshot
from .keyframe_updater import KeyframeUpdater
from .information_matrix import InformationMatrixCalculator, fitness_score
from .loop_detector import LoopDetector, Loop
from .map_cloud_generator import MapCloudGenerator
from .flow import BoundedQueue, Watermark

__all__ = [
    "KeyFrame", "KeyFrameSnapshot", "KeyframeUpdater",
    "InformationMatrixCalculator", "fitness_score",
    "LoopDetector", "Loop", "MapCloudGenerator",
    "BoundedQueue", "Watermark", "Pipeline",
]


def __getattr__(name):
    # lazy to avoid a circular import (runner -> config -> models -> pipeline)
    if name == "Pipeline":
        from .runner import Pipeline

        return Pipeline
    raise AttributeError(name)
