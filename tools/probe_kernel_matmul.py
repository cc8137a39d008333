"""Probe: Mosaic in-kernel f32 matmul vs XLA matmul at HIGHEST precision.

Decides whether the whole-level fused kernel can run the box-resample
matmuls on the MXU *inside* the kernel without breaking the oracle EPE
contract. Run on the real chip:  python tools/probe_kernel_matmul.py
"""
import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H0, HB, W0 = 448, 64, 640


def kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


@jax.jit
def in_kernel(a, b):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((HB, W0), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)


@jax.jit
def in_xla(a, b):
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def main():
    rng = np.random.default_rng(0)
    # Weight-matrix-like A (sparse band of box weights), image-like B.
    a = np.zeros((HB, H0), np.float32)
    for i in range(HB):
        j = min(int(i * H0 / HB), H0 - 9)
        a[i, j : j + 9] = rng.random(9, dtype=np.float32)
    b = (200.0 * rng.random((H0, W0))).astype(np.float32)

    got = np.asarray(in_kernel(jnp.asarray(a), jnp.asarray(b)))
    want = np.asarray(in_xla(jnp.asarray(a), jnp.asarray(b)))
    diff = np.abs(got - want)
    print("max abs diff:", diff.max(), " bitwise equal:", bool((got == want).all()))
    rel = diff.max() / np.abs(want).max()
    print("rel:", rel)


if __name__ == "__main__":
    main()
