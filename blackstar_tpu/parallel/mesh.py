"""Device-mesh construction and multi-host initialisation.

The reference's only parallelism is shared-memory work-stealing over pixels
(massiv ``Par``, Raytracer.hs:66; RTS ``-N``, blackstar.cabal:47). The
TPU-native equivalent is ray-tile data parallelism over a
``jax.sharding.Mesh``: forward rendering is embarrassingly parallel over
pixels, so a 1-D ``('rays',)`` mesh over every addressable device (ICI within
a slice, DCN across slices) is the canonical layout. Gradients of the small
scene-parameter pytree are the only cross-device traffic (one psum in the
backward pass, see ``blackstar_tpu.fit``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = RAY_AXIS) -> Mesh:
    """A 1-D data-parallel mesh over ``devices`` (default: all devices)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharding(mesh: Mesh, axis_name: str = RAY_AXIS) -> NamedSharding:
    """Shard the leading (ray) axis of an array over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up: wraps ``jax.distributed.initialize``.

    On TPU pods the three arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU clusters. After this, ``jax.devices()``
    spans the full pod slice and :func:`make_mesh` lays the ray axis over
    every chip (the batch "multi-node" story the reference lacks,
    app/Main.hs:64-78).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
