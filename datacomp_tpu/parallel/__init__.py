"""Multi-chip / multi-host scaling: mesh helpers and the sharded compress step."""

from .mesh import make_mesh
from .sharded import make_sharded_compress_step, sharded_compress_arrays

__all__ = ["make_mesh", "make_sharded_compress_step", "sharded_compress_arrays"]
