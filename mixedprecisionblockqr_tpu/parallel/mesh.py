"""Device-mesh helpers.

Centralizes mesh construction so every distributed entry point (TSQR, CAQR,
distributed block QR, batched solves) agrees on axis names:

  * ``rows``  — the long/row dimension of tall matrices is sharded here
                (sequence-parallel analog; TSQR tree rides this axis),
  * ``batch`` — independent problems (data-parallel analog; ``vmap`` +
                sharding over this axis).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROWS_AXIS = "rows"
BATCH_AXIS = "batch"


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = (ROWS_AXIS,),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over the available devices.  Defaults to a 1-D mesh over
    all devices on the ``rows`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    return jax.make_mesh(shape, tuple(axis_names), devices=devices)


def row_sharding(mesh: Mesh, axis: str = ROWS_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rows(x: jax.Array, mesh: Mesh, axis: str = ROWS_AXIS) -> jax.Array:
    return jax.device_put(x, row_sharding(mesh, axis))
