"""Window median filter — median_2d.cu in JAX.

``radius`` is the window SIDE length (3/5/7), mirror ('reflect') boundary
(reference: src/kernels/median_2d.cu:87-299). Host-wrapper guards replicated
(reference: cuda_operation_median_2d.cpp:100-109,152-154): radius 1 -> copy,
even radius decremented, > 7 rejected.

Implementation: stack the radius^2 shifted neighborhoods and sort along the
window axis with XLA's sort, taking element len/2. A Pallas sorting-network
version exists for the hot path (tpuflow.ops.pallas.median) — for windows of
<= 49 elements a partial rank-selection network beats a full sort.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def median(img: jax.Array, radius: int) -> jax.Array:
    if radius > 7:
        raise ValueError("median radius > 7 not supported (reference parity)")
    if radius % 2 == 0:
        radius -= 1
    if radius <= 1:
        return img
    r2 = radius // 2
    h, w = img.shape
    padded = jnp.pad(img, r2, mode="reflect")
    windows = [
        padded[iy : iy + h, ix : ix + w]
        for iy in range(radius)
        for ix in range(radius)
    ]
    stack = jnp.stack(windows, axis=-1)
    ordered = jnp.sort(stack, axis=-1)
    return ordered[..., (radius * radius) // 2]
