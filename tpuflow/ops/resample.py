"""Area (box) resampling as matmuls — the TPU-native form of resample_2d.cu.

The reference kernel integrates, for each output cell, the input cells
overlapped by ``[o*delta, (o+1)*delta]`` with fractional end weights, then
multiplies by ``out/in`` (reference: src/kernels/resample_2d.cu:44-74).
That is exactly a linear map with a sparse banded weight matrix per axis, so
on TPU we build the (out, in) float32 weight matrix host-side (cached per
shape pair) and apply both axes as matrix multiplies on the MXU:

    out = W_y @ (img @ W_x^T)

This is value-preserving on upsample and area-averaging on downsample, like
the reference, and turns an awkward variable-length gather loop into two
dense matmuls that XLA tiles onto the systolic array.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

F = np.float32


@functools.lru_cache(maxsize=1024)
def resample_weights(in_n: int, out_n: int) -> np.ndarray:
    """(out_n, in_n) float32 box-overlap weight matrix, normalization folded in.

    Weights transliterate the fraction logic of resample_2d.cu:48-72 so the
    matmul reproduces the reference integral exactly (up to f32 summation
    order).
    """
    delta = F(F(in_n) / F(out_n))
    norm = F(F(out_n) / F(in_n))
    w = np.zeros((out_n, in_n), dtype=F)
    for o in range(out_n):
        left_f = F(F(o) * delta)
        right_f = F(F(o + 1) * delta)
        left_i = int(math.floor(left_f))
        right_i = min(in_n, int(math.ceil(right_f)))
        n = right_i - left_i
        for j in range(n):
            frac = F(1.0)
            if j == 0:
                frac = F(F(left_i + 1) - left_f)
            if j == n - 1:
                frac = F(right_f - F(left_i + j))
            if n == 1:
                frac = delta
            w[o, left_i + j] = F(frac * norm)
    return w


def box_weights_dyn(out_bucket: int, in_bucket: int, out_n, in_n) -> jax.Array:
    """Box-overlap weight matrix computed ON DEVICE with traced sizes.

    Produces the same float32 fractions as `resample_weights` (transliterated
    from resample_2d.cu:48-72: the j==0 / j==n-1 / single-cell rules applied
    in the reference's override order), but (out_n, in_n) are runtime
    scalars, so one compiled program serves every pyramid level — and no
    per-level host->device weight upload is needed.

    Rows >= out_n and cols >= in_n are zero (the bucketed ghost region).
    """
    out_f = out_n.astype(jnp.float32) if hasattr(out_n, "astype") else jnp.float32(out_n)
    in_f = in_n.astype(jnp.float32) if hasattr(in_n, "astype") else jnp.float32(in_n)
    delta = in_f / out_f
    norm = out_f / in_f

    of = jax.lax.broadcasted_iota(jnp.float32, (out_bucket, in_bucket), 0)
    iif = jax.lax.broadcasted_iota(jnp.float32, (out_bucket, in_bucket), 1)

    left_f = of * delta
    right_f = (of + 1.0) * delta
    left_i = jnp.floor(left_f)
    right_i = jnp.minimum(in_f, jnp.ceil(right_f))

    in_range = (iif >= left_i) & (iif <= right_i - 1.0)
    frac = jnp.ones_like(of)
    frac = jnp.where(iif == left_i, (left_i + 1.0) - left_f, frac)
    frac = jnp.where(iif == right_i - 1.0, right_f - iif, frac)
    frac = jnp.where(right_i - left_i == 1.0, delta, frac)

    return jnp.where(in_range, frac * norm, 0.0)


def resample(img: jax.Array, out_w: int, out_h: int) -> jax.Array:
    """Resample an (H, W) image to (out_h, out_w) via two MXU matmuls."""
    in_h, in_w = img.shape
    if (in_h, in_w) == (out_h, out_w):
        return img
    wx = jnp.asarray(resample_weights(in_w, out_w))  # (out_w, in_w)
    wy = jnp.asarray(resample_weights(in_h, out_h))  # (out_h, in_h)
    # X first, then Y, matching the host wrapper sequencing
    # (reference: cuda_operation_resample_2d.cpp:99-106).
    tmp = jnp.matmul(img, wx.T, precision=lax.Precision.HIGHEST)
    return jnp.matmul(wy, tmp, precision=lax.Precision.HIGHEST)
