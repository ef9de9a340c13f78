"""Core codec: canonical Huffman codebooks, bitstreams, and the `.dcz` container."""

from .huffman import (
    ALPHABET_SIZE,
    MAX_CODE_LEN,
    build_code_lengths,
    build_codebook,
    canonical_codes_from_lengths,
    validate_lengths,
)
from .bitio import (
    CanonicalDecodeTables,
    decode_bitstream_py,
    encode_bitstream,
    encoded_size_bits,
)
from .container import (
    CHUNK_META_LEN_V1,
    MAGIC,
    VERSION_V1,
    VERSION_V2,
    ChunkMeta,
    ContainerError,
    ContainerHeader,
    TruncatedFooter,
    parse_footer,
    read_container,
    read_container_fp,
    scan_for_footer,
    serialize_footer,
    write_container,
)

__all__ = [
    "ALPHABET_SIZE",
    "MAX_CODE_LEN",
    "build_code_lengths",
    "build_codebook",
    "canonical_codes_from_lengths",
    "validate_lengths",
    "CanonicalDecodeTables",
    "decode_bitstream_py",
    "encode_bitstream",
    "encoded_size_bits",
    "CHUNK_META_LEN_V1",
    "MAGIC",
    "VERSION_V1",
    "VERSION_V2",
    "ChunkMeta",
    "ContainerError",
    "ContainerHeader",
    "TruncatedFooter",
    "parse_footer",
    "read_container",
    "read_container_fp",
    "scan_for_footer",
    "serialize_footer",
    "write_container",
]
