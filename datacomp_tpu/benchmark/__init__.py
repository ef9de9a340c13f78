"""Benchmark suite (parity: ``benchmark/BenchmarkSuite.java``)."""

from .suite import BenchmarkResult, BenchmarkSuite

__all__ = ["BenchmarkResult", "BenchmarkSuite"]
