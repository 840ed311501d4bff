"""Line-feature scan matching against building outlines.

TPU-native rebuild of the reference LineBasedScanmatcher
(/root/reference/src/hdl_graph_slam/line_based_scanmatcher.cpp, 1.1k LoC
C++): line segments live in fixed-capacity masked arrays, corner ("edge")
extraction is a dense pairwise tensor op, and the greedy best-so-far
candidate loops become chunked score-everything + argmax (exact for the
reference's strict-improvement semantics, including first-wins ties).
"""

from .features import (
    LineSegments,
    EdgeFeatures,
    make_lines,
    transform_lines,
    edge_extraction,
    align_edges,
    align_lines_pair,
)
from .scoring import (
    FitnessScore,
    line_to_line_distance,
    calc_fitness_score,
    nearest_neighbor,
    weight_score,
)
from .align import (
    LineScanmatcherConfig,
    BestFitAlignment,
    LineBasedScanmatcher,
)
from .merge import merge_lines, are_lines_aligned
from .overlap import are_buildings_overlapped, segments_intersect

__all__ = [
    "LineSegments", "EdgeFeatures", "make_lines", "transform_lines",
    "edge_extraction", "align_edges", "align_lines_pair",
    "FitnessScore", "line_to_line_distance", "calc_fitness_score",
    "nearest_neighbor", "weight_score",
    "LineScanmatcherConfig", "BestFitAlignment", "LineBasedScanmatcher",
    "merge_lines", "are_lines_aligned",
    "are_buildings_overlapped", "segments_intersect",
]
