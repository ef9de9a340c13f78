"""`.dcz` container format tests: exact byte layout vs the reference spec
(``docs/FILE_FORMAT.md``, ``core/CompressionHeader.java:51-144``), footer-last
+ legacy header-first reads, v2 gap-array extension."""

import struct

import numpy as np
import pytest

from datacomp_tpu.core import (
    CHUNK_META_LEN_V1,
    MAGIC,
    ChunkMeta,
    ContainerError,
    ContainerHeader,
    parse_footer,
    read_container,
    serialize_footer,
    write_container,
)


def mk_header(nchunks=2, version=1, name="input.bin"):
    h = ContainerHeader(
        original_file_name=name,
        original_file_size=nchunks * 100,
        original_timestamp=1_700_000_000_123,
        global_sha256=bytes(range(32)),
        chunk_size_bytes=100,
        version=version,
        subblock_symbols=64 if version >= 2 else 0,
    )
    off = 0
    for i in range(nchunks):
        lens = np.zeros(256, dtype=np.int32)
        lens[i] = 8
        gaps = np.arange(3, dtype=np.uint32) if version >= 2 else None
        h.chunks.append(ChunkMeta(i, i * 100, 100, off, 50 + i, bytes([i]) * 32, lens, gaps))
        off += 50 + i
    return h


def test_footer_byte_layout_v1_exact():
    """Field-by-field check of the serialized footer against the Java
    DataOutputStream layout."""
    h = mk_header(nchunks=1)
    buf = serialize_footer(h)
    name = b"input.bin"
    assert buf[:4] == struct.pack(">i", MAGIC)
    assert buf[4:8] == struct.pack(">i", 1)
    assert buf[8:12] == struct.pack(">i", len(name))
    assert buf[12 : 12 + len(name)] == name
    p = 12 + len(name)
    assert buf[p : p + 8] == struct.pack(">q", 100)
    assert buf[p + 8 : p + 16] == struct.pack(">q", 1_700_000_000_123)
    assert buf[p + 16 : p + 20] == struct.pack(">i", 100)
    assert buf[p + 20 : p + 52] == bytes(range(32))
    assert buf[p + 52 : p + 56] == struct.pack(">i", 1)
    # per-chunk record is exactly 572 bytes in v1
    assert len(buf) == p + 56 + CHUNK_META_LEN_V1
    chunk = buf[p + 56 :]
    assert chunk[:4] == struct.pack(">i", 0)  # index
    assert chunk[4:12] == struct.pack(">q", 0)  # original offset
    assert chunk[12:16] == struct.pack(">i", 100)  # original size
    assert chunk[16:24] == struct.pack(">q", 0)  # compressed offset
    assert chunk[24:28] == struct.pack(">i", 50)  # compressed size
    assert chunk[28:60] == bytes([0]) * 32
    lens = np.frombuffer(chunk[60:572], dtype=">i2")
    assert lens[0] == 8 and (lens[1:] == 0).all()


@pytest.mark.parametrize("version", [1, 2])
def test_footer_roundtrip(version):
    h = mk_header(nchunks=3, version=version)
    h2 = parse_footer(serialize_footer(h))
    assert h2.original_file_name == h.original_file_name
    assert h2.original_file_size == h.original_file_size
    assert h2.original_timestamp == h.original_timestamp
    assert h2.chunk_size_bytes == h.chunk_size_bytes
    assert h2.global_sha256 == h.global_sha256
    assert h2.version == version
    assert h2.num_chunks == 3
    for a, b in zip(h.chunks, h2.chunks):
        assert (a.index, a.original_offset, a.original_size) == (
            b.index, b.original_offset, b.original_size)
        assert (a.compressed_offset, a.compressed_size) == (b.compressed_offset, b.compressed_size)
        assert a.sha256 == b.sha256
        assert np.array_equal(a.code_lengths, b.code_lengths)
        if version >= 2:
            assert np.array_equal(a.gap_bits, b.gap_bits)


def test_footer_last_file_layout(tmp_path):
    h = mk_header(nchunks=2)
    payloads = [b"a" * 50, b"b" * 51]
    p = tmp_path / "x.dcz"
    with open(p, "wb") as f:
        write_container(f, h, payloads)
    raw = p.read_bytes()
    # payloads first
    assert raw[:50] == b"a" * 50 and raw[50:101] == b"b" * 51
    # trailing 8 bytes point at the footer start
    (ptr,) = struct.unpack(">q", raw[-8:])
    assert ptr == 101
    h2, data_start = read_container(str(p))
    assert data_start == 0 and h2.num_chunks == 2


def test_legacy_header_first_read(tmp_path):
    """Reference dual-format probe: header at offset 0, payloads at
    fileSize − ΣcompressedSize."""
    h = mk_header(nchunks=2)
    payloads = [b"a" * 50, b"b" * 51]
    p = tmp_path / "legacy.dcz"
    with open(p, "wb") as f:
        f.write(serialize_footer(h))
        for pl in payloads:
            f.write(pl)
    h2, data_start = read_container(str(p))
    assert h2.num_chunks == 2
    assert data_start == p.stat().st_size - 101


def test_bad_magic_rejected():
    h = mk_header()
    buf = bytearray(serialize_footer(h))
    buf[0] = 0xFF
    with pytest.raises(ContainerError):
        parse_footer(bytes(buf))


def test_unsupported_version_rejected():
    h = mk_header()
    buf = bytearray(serialize_footer(h))
    buf[4:8] = struct.pack(">i", 99)
    with pytest.raises(ContainerError):
        parse_footer(bytes(buf))


def test_truncated_footer_rejected():
    h = mk_header()
    buf = serialize_footer(h)
    with pytest.raises(ContainerError):
        parse_footer(buf[: len(buf) - 10])


def test_invalid_footer_pointer(tmp_path):
    p = tmp_path / "bad.dcz"
    p.write_bytes(b"x" * 100 + struct.pack(">q", 10_000))
    with pytest.raises(ContainerError):
        read_container(str(p))


def test_utf8_filename():
    h = mk_header(name="données_压缩.bin")
    h2 = parse_footer(serialize_footer(h))
    assert h2.original_file_name == "données_压缩.bin"
