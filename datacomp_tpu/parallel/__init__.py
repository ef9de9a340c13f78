"""Multi-chip / multi-host scaling: mesh helpers and the sharded compress step."""

from .mesh import make_mesh
from .sharded import (
    check_decompress_step_params,
    make_sharded_compress_step,
    make_sharded_decompress_step,
    sharded_compress_arrays,
    sharded_decompress_arrays,
)
from .multihost import (
    ChunkAssignment,
    assemble_header,
    compress_multihost,
    decompress_multihost,
    global_offsets,
    initialize_distributed,
    interleave_gathered,
    spill_to_output,
    write_footer_host0,
    write_host_payloads,
)

__all__ = [
    "make_mesh",
    "check_decompress_step_params",
    "make_sharded_compress_step",
    "make_sharded_decompress_step",
    "sharded_compress_arrays",
    "sharded_decompress_arrays",
    "ChunkAssignment",
    "assemble_header",
    "compress_multihost",
    "decompress_multihost",
    "global_offsets",
    "initialize_distributed",
    "interleave_gathered",
    "spill_to_output",
    "write_footer_host0",
    "write_host_payloads",
]
