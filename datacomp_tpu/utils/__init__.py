"""Cross-cutting utilities: checksums and deterministic test-data generation."""

from .checksum import compute_sha256, sha256_digest
from .testdata import generate_compressible_file, generate_random_file, java_random_bytes

__all__ = [
    "compute_sha256",
    "sha256_digest",
    "generate_compressible_file",
    "generate_random_file",
    "java_random_bytes",
]
