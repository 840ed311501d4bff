"""Typed pipeline configuration tree + launch-file presets."""

from .presets import PipelineConfig, PRESETS, get_preset

__all__ = ["PipelineConfig", "PRESETS", "get_preset"]
