"""Service-layer interfaces (parity: ``service/CompressionService.java:11-66``
and ``service/FrequencyService.java:6-27``)."""

from __future__ import annotations

import abc
from typing import Callable, Optional

import numpy as np

from ..models import StageMetrics

ProgressCallback = Optional[Callable[[float], None]]


class CompressionService(abc.ABC):
    """The framework's primary API surface."""

    @abc.abstractmethod
    def compress(self, input_path: str, output_path: str, progress: ProgressCallback = None) -> None:
        ...

    @abc.abstractmethod
    def decompress(self, input_path: str, output_path: str, progress: ProgressCallback = None) -> None:
        ...

    @abc.abstractmethod
    def resume_compression(
        self, input_path: str, output_path: str, last_completed_chunk: int,
        progress: ProgressCallback = None,
    ) -> None:
        """Continue an interrupted compression.  The reference declares this
        and throws UnsupportedOperationException
        (``CpuCompressionService.java:635-641``); this framework implements it
        for real via a sidecar progress file (see ``pipeline.py``)."""

    @abc.abstractmethod
    def verify_integrity(self, compressed_path: str) -> bool:
        ...

    @abc.abstractmethod
    def get_service_name(self) -> str:
        ...

    @abc.abstractmethod
    def is_available(self) -> bool:
        ...

    def get_last_stage_metrics(self) -> StageMetrics:
        return getattr(self, "_stage_metrics", StageMetrics())

    def close(self) -> None:  # noqa: B027 — optional hook
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class FrequencyService(abc.ABC):
    """Histogram API (256-bin byte frequency)."""

    @abc.abstractmethod
    def compute_histogram(self, data: np.ndarray, offset: int = 0, length: Optional[int] = None) -> np.ndarray:
        """Return int64[256] counts over ``data[offset:offset+length]``."""

    @abc.abstractmethod
    def get_service_name(self) -> str:
        ...

    @abc.abstractmethod
    def is_available(self) -> bool:
        ...
