"""Shared utilities: small linear algebra, profiling, logging."""

from .linalg import inv3x3, inv2x2
from .profiling import StageTimer, device_trace

__all__ = ["inv3x3", "inv2x2", "StageTimer", "device_trace"]
