"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    mesh_shape: Optional[Tuple[int, int]] = None,
    axis_names: Sequence[str] = ("data", "y"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'y') mesh over the available devices.

    ``data`` batches independent frame pairs; ``y`` shards image rows.
    Defaults put as many devices as possible on the spatial axis (dense PDE
    work scales with area), keeping ``data`` for leftover factors of two.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if mesh_shape is None:
        # Prefer spatial sharding; peel one factor of 2 to 'data' when n >= 8.
        if n >= 8 and n % 2 == 0:
            mesh_shape = (2, n // 2)
        else:
            mesh_shape = (1, n)
    if int(np.prod(mesh_shape)) != n:
        raise ValueError(f"mesh shape {mesh_shape} does not cover {n} devices")
    arr = np.asarray(devices).reshape(mesh_shape)
    return Mesh(arr, axis_names=tuple(axis_names))
