"""Backward registration (bilinear warp) — registration_2d.cu in JAX.

Semantics (reference: src/kernels/registration_2d.cu:48-72):
  * target ``x_f = x + u/hx``, ``y_f = y + v/hy`` (flow in ORIGINAL-pixel
    units, converted to level pixels via 1/h);
  * out of ``[0, w-1] x [0, h-1]`` or NaN -> copy frame_0's pixel (zeroing
    the time derivative there);
  * otherwise 4-tap bilinear with the +1 neighbors clamped to the edge.

Implemented as a flat XLA gather; runs once per level so it is nowhere near
the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def warp(
    frame_0: jax.Array,
    frame_1: jax.Array,
    u: jax.Array,
    v: jax.Array,
    hx: float,
    hy: float,
) -> jax.Array:
    h, w = frame_0.shape
    dtype = frame_0.dtype
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x_f = xs + u * jnp.float32(1.0 / jnp.float32(hx))
    y_f = ys + v * jnp.float32(1.0 / jnp.float32(hy))

    invalid = (
        (x_f < 0.0)
        | (x_f > w - 1)
        | (y_f < 0.0)
        | (y_f > h - 1)
        | jnp.isnan(x_f)
        | jnp.isnan(y_f)
    )

    safe_x = jnp.where(invalid, 0.0, x_f)
    safe_y = jnp.where(invalid, 0.0, y_f)
    x0 = jnp.floor(safe_x).astype(jnp.int32)
    y0 = jnp.floor(safe_y).astype(jnp.int32)
    dx = (safe_x - x0.astype(jnp.float32)).astype(dtype)
    dy = (safe_y - y0.astype(jnp.float32)).astype(dtype)
    x1 = jnp.minimum(w - 1, x0 + 1)
    y1 = jnp.minimum(h - 1, y0 + 1)

    flat = frame_1.reshape(-1)

    def at(yy, xx):
        return jnp.take(flat, yy * w + xx, axis=0)

    one = jnp.float32(1.0)
    value = (
        (one - dx) * (one - dy) * at(y0, x0)
        + dx * (one - dy) * at(y0, x1)
        + (one - dx) * dy * at(y1, x0)
        + dx * dy * at(y1, x1)
    )
    return jnp.where(invalid, frame_0, value)
