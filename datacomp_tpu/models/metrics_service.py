"""Thread-safe metrics singleton: ring buffer of recent operations + listener
push (parity: ``service/MetricsService.java:18-113`` — 50-entry ring buffer,
listener notification, average-throughput queries)."""

from __future__ import annotations

import threading
from collections import deque
from typing import Callable, Deque, List, Optional

from .compression_metrics import CompressionMetrics, OperationType

MAX_METRICS = 50

MetricsListener = Callable[[CompressionMetrics], None]


class MetricsService:
    _instance: Optional["MetricsService"] = None
    _instance_lock = threading.Lock()

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._metrics: Deque[CompressionMetrics] = deque(maxlen=MAX_METRICS)
        self._listeners: List[MetricsListener] = []

    @classmethod
    def get_instance(cls) -> "MetricsService":
        with cls._instance_lock:
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

    @classmethod
    def reset_instance(cls) -> None:
        with cls._instance_lock:
            cls._instance = None

    def add_metrics(self, m: CompressionMetrics) -> None:
        with self._lock:
            self._metrics.append(m)
            listeners = list(self._listeners)
        for listener in listeners:
            try:
                listener(m)
            except Exception:  # noqa: BLE001 — a bad listener must not break the pipeline
                pass

    def add_listener(self, listener: MetricsListener) -> None:
        with self._lock:
            self._listeners.append(listener)

    def remove_listener(self, listener: MetricsListener) -> None:
        with self._lock:
            if listener in self._listeners:
                self._listeners.remove(listener)

    def get_recent(self, n: int = MAX_METRICS) -> List[CompressionMetrics]:
        with self._lock:
            return list(self._metrics)[-n:]

    def get_last(self) -> Optional[CompressionMetrics]:
        with self._lock:
            return self._metrics[-1] if self._metrics else None

    def average_throughput_mbps(self, op: Optional[OperationType] = None) -> float:
        with self._lock:
            vals = [
                m.throughput_mbps
                for m in self._metrics
                if op is None or m.operation is op
            ]
        return sum(vals) / len(vals) if vals else 0.0

    def clear(self) -> None:
        with self._lock:
            self._metrics.clear()
