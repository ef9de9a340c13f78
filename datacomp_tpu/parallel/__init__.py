"""Multi-chip / multi-host scaling: mesh helpers and the sharded compress step."""

from .mesh import make_mesh
from .sharded import (
    make_sharded_compress_step,
    make_sharded_decompress_step,
    sharded_compress_arrays,
)
from .multihost import (
    ChunkAssignment,
    assemble_header,
    compress_multihost,
    global_offsets,
    initialize_distributed,
    interleave_gathered,
    write_footer_host0,
    write_host_payloads,
)

__all__ = [
    "make_mesh",
    "make_sharded_compress_step",
    "make_sharded_decompress_step",
    "sharded_compress_arrays",
    "ChunkAssignment",
    "assemble_header",
    "compress_multihost",
    "global_offsets",
    "initialize_distributed",
    "interleave_gathered",
    "write_footer_host0",
    "write_host_payloads",
]
