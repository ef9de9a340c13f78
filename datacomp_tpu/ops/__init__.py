"""TPU device ops (JAX/XLA/Pallas): histogram, encode, decode, codebook."""

from .histogram import histogram_device, histogram_np
from .encode import encode_device, words_to_bytes
from .decode import (
    TABLE_BITS,
    build_decode_table,
    decode_device,
    max_code_len,
    payload_to_words,
)
from .codebook import device_canonical_codes, device_code_lengths, device_codebook

__all__ = [
    "histogram_device",
    "histogram_np",
    "encode_device",
    "words_to_bytes",
    "TABLE_BITS",
    "build_decode_table",
    "decode_device",
    "max_code_len",
    "payload_to_words",
    "device_canonical_codes",
    "device_code_lengths",
    "device_codebook",
]
