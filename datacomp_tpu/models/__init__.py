"""Metrics data models (reference parity: ``model/`` + ``service/MetricsService.java``)."""

from .stage_metrics import Stage, StageMetrics
from .compression_metrics import CompressionMetrics, OperationType
from .metrics_service import MetricsService

__all__ = [
    "Stage",
    "StageMetrics",
    "CompressionMetrics",
    "OperationType",
    "MetricsService",
]
