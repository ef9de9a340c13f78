"""Service layer: compression/frequency services, factory, shared pipeline."""

from .base import CompressionService, FrequencyService
from .cpu_service import CpuCompressionService, CpuFrequencyService
from .factory import create_compression_service, create_frequency_service
from .pipeline import ChunkCodec, ChunkedPipeline, EncodedChunk

__all__ = [
    "CompressionService",
    "FrequencyService",
    "CpuCompressionService",
    "CpuFrequencyService",
    "create_compression_service",
    "create_frequency_service",
    "ChunkCodec",
    "ChunkedPipeline",
    "EncodedChunk",
]
