"""Mesh-sharded rendering and multi-host utilities."""

from blackstar_tpu.parallel.mesh import (
    RAY_AXIS,
    initialize_distributed,
    make_mesh,
    replicated,
    row_sharding,
)
from blackstar_tpu.parallel.render import render_sharded

__all__ = [
    "RAY_AXIS",
    "initialize_distributed",
    "make_mesh",
    "replicated",
    "row_sharding",
    "render_sharded",
]
