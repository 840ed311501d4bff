"""OpenStreetMap building-footprint constraint system.

Rebuild of BuildingTools/Building (/root/reference/src/hdl_graph_slam/
building_tools.cpp, building.cpp): an async host-side Overpass client
(with offline XML/synthetic providers for deterministic replay) feeding
device-resident polygon buffers, plus the Building entity whose
lines/cloud re-pose by the current graph estimate rotated about the
building center.
"""

from .building import Building, building_map_transform
from .manager import (
    BuildingManager,
    OverpassProvider,
    FileProvider,
    StaticProvider,
    parse_osm_xml,
)

__all__ = [
    "Building", "building_map_transform",
    "BuildingManager", "OverpassProvider", "FileProvider", "StaticProvider",
    "parse_osm_xml",
]
