"""TPU device ops (JAX/XLA/Pallas): histogram, encode, decode, codebook."""

import os as _os


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: first-ever compiles of the chunk
    pipeline are expensive (minutes at 16 MB shapes through the TPU
    toolchain); caching makes every later process start instantly."""
    import jax

    if jax.config.jax_compilation_cache_dir is None:
        cache = _os.environ.get(
            "DATACOMP_JAX_CACHE", _os.path.expanduser("~/.cache/datacomp_tpu_xla")
        )
        _os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


_enable_compilation_cache()

from .histogram import histogram_device, histogram_np
from .histogram_pallas import histogram_pallas, pallas_available
# NOTE: ops/encode_scan_oracle.py is a differential test oracle, deliberately
# NOT exported — encode_device_merge is the one production encoder.
from .encode_merge import (
    code_bits_bucket,
    encode_device_merge,
    encode_device_merge_batch_slotted,
    encode_device_merge_slotted,
    slot_bucket,
    SLOT_BUCKETS,
    words_to_bytes,
)
from .decode import (
    DEFAULT_REFILL_WORDS,
    TABLE_BITS,
    build_decode_tables,
    cmp_len_bucket,
    decode_device,
    max_code_len,
    payload_to_words,
    syms_per_refill,
)
from .codebook import device_canonical_codes, device_code_lengths, device_codebook

__all__ = [
    "histogram_device",
    "histogram_np",
    "histogram_pallas",
    "pallas_available",
    "code_bits_bucket",
    "encode_device_merge",
    "encode_device_merge_batch_slotted",
    "encode_device_merge_slotted",
    "slot_bucket",
    "SLOT_BUCKETS",
    "words_to_bytes",
    "DEFAULT_REFILL_WORDS",
    "TABLE_BITS",
    "build_decode_tables",
    "cmp_len_bucket",
    "decode_device",
    "max_code_len",
    "payload_to_words",
    "syms_per_refill",
    "device_canonical_codes",
    "device_code_lengths",
    "device_codebook",
]
