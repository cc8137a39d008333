"""Op-by-op parity: JAX ops vs the NumPy oracle (tpuflow.oracle).

Covers mirror boundaries, odd sizes, up/down-sampling, out-of-range warp
targets, even/unit median radii, and all three data-constancy sweeps.
"""

import numpy as np
import pytest

import tpuflow.oracle as oracle
from tpuflow.config import DataConstancy
from tpuflow.ops import (
    compute_phi_ksi,
    gaussian_kernel_taps,
    gaussian_smooth,
    median,
    resample,
    solve_sweep,
    warp,
)

RNG = np.random.default_rng(42)


def rand(h, w, scale=1.0):
    return (RNG.random((h, w), dtype=np.float32) * scale).astype(np.float32)


# ---------------------------------------------------------------- gaussian


def test_gaussian_taps_match_oracle():
    for sigma in (0.45, 1.0, 1.5, 3.0):
        np.testing.assert_array_equal(
            gaussian_kernel_taps(sigma), oracle.gaussian_kernel(sigma)
        )


def test_gaussian_taps_radius_truncation():
    # radius = floor(3 * sigma): sigma=1.5 -> 4 -> 9 taps.
    assert len(gaussian_kernel_taps(1.5)) == 9
    assert len(gaussian_kernel_taps(0.45)) == 3


def test_gaussian_smooth_matches_oracle():
    img = rand(13, 9, 255.0)
    want = oracle.convolve_separable(img, oracle.gaussian_kernel(1.5))
    got = np.asarray(gaussian_smooth(img, 1.5))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-4)


def test_gaussian_smooth_zero_sigma_is_identity():
    img = rand(5, 5)
    np.testing.assert_array_equal(np.asarray(gaussian_smooth(img, 0.0)), img)


# ---------------------------------------------------------------- resample


@pytest.mark.parametrize(
    "in_shape,out_shape",
    [
        ((10, 10), (7, 7)),    # downsample
        ((7, 7), (10, 10)),    # upsample
        ((13, 9), (12, 8)),    # slight shrink, odd sizes
        ((9, 13), (9, 13)),    # identity
        ((20, 4), (4, 17)),    # mixed
    ],
)
def test_resample_matches_oracle(in_shape, out_shape):
    img = rand(*in_shape, scale=255.0)
    want = oracle.resample(img, out_shape[1], out_shape[0])
    got = np.asarray(resample(img, out_shape[1], out_shape[0]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_resample_value_preserving_on_upsample():
    # Box resampling preserves the mean on integer upsampling.
    img = rand(6, 6, 10.0)
    up = np.asarray(resample(img, 12, 12))
    np.testing.assert_allclose(up.mean(), img.mean(), rtol=1e-5)


@pytest.mark.parametrize(
    "out_bucket,out_hw,in_bucket,in_hw",
    [
        ((448, 640), (388, 584), (448, 640), (388, 584)),  # same size
        ((448, 640), (369, 555), (448, 640), (388, 584)),  # slight shrink
        ((64, 128), (58, 88), (448, 640), (388, 584)),     # deep shrink
        ((128, 256), (100, 200), (448, 640), (95, 190)),   # flow upsample
        ((64, 128), (12, 17), (448, 640), (388, 584)),     # extreme shrink
    ],
)
def test_resample_banded_matches_dense(out_bucket, out_hw, in_bucket, in_hw):
    # The banded-gather path (production under the unrolled pipeline) is
    # the same linear map as the bucketed dense matmuls: the band values
    # ARE the dense matrix's nonzeros, so only f32 summation order may
    # differ.
    import jax.numpy as jnp
    from jax import lax

    from tpuflow.ops.resample import resample_banded, resample_weights

    rng = np.random.default_rng(0)
    x = np.zeros(in_bucket, np.float32)
    gh, gw = in_hw[0] + 2, in_hw[1] + 2
    x[:gh, :gw] = rng.standard_normal((gh, gw)).astype(np.float32)
    wy = np.zeros((out_bucket[0], in_bucket[0]), np.float32)
    wx = np.zeros((out_bucket[1], in_bucket[1]), np.float32)
    wy[: out_hw[0], : in_hw[0]] = resample_weights(in_hw[0], out_hw[0])
    wx[: out_hw[1], : in_hw[1]] = resample_weights(in_hw[1], out_hw[1])
    dense = jnp.matmul(
        jnp.asarray(wy),
        jnp.matmul(jnp.asarray(x), jnp.asarray(wx).T,
                   precision=lax.Precision.HIGHEST),
        precision=lax.Precision.HIGHEST,
    )
    band = resample_banded(jnp.asarray(x), out_bucket, out_hw, in_hw)
    assert band.shape == out_bucket
    np.testing.assert_allclose(np.asarray(band), np.asarray(dense), atol=1e-6)


@pytest.mark.parametrize(
    "out_bucket,out_hw,in_bucket,in_hw",
    [
        ((1088, 2048), (975, 1730), (1088, 2048), (1080, 1920)),  # 1080p L1
        ((576, 1024), (540, 960), (1088, 2048), (1080, 1920)),    # 2x shrink
        ((1088, 2048), (1080, 1920), (576, 1024), (540, 960)),    # upsample
        ((64, 128), (30, 54), (1088, 2048), (1080, 1920)),        # deep
    ],
)
def test_resample_blocked_matches_dense(out_bucket, out_hw, in_bucket, in_hw):
    # The block-banded form (production for 1080p-class contractions) is
    # the same linear map as the dense bucketed matmuls — every excluded
    # entry is an exact zero; only fp summation trees may differ.
    import jax.numpy as jnp
    from jax import lax

    from tpuflow.ops.resample import (
        box_weights_dyn,
        resample_cols_blocked,
        resample_rows_blocked,
    )

    rng = np.random.default_rng(1)
    x = np.zeros(in_bucket, np.float32)
    gh = min(in_bucket[0], in_hw[0] + 2)
    gw = min(in_bucket[1], in_hw[1] + 2)
    x[:gh, :gw] = rng.standard_normal((gh, gw)).astype(np.float32) * 50.0
    x = jnp.asarray(x)
    wy = box_weights_dyn(out_bucket[0], in_bucket[0], float(out_hw[0]),
                         float(in_hw[0]))
    wx = box_weights_dyn(out_bucket[1], in_bucket[1], float(out_hw[1]),
                         float(in_hw[1]))
    dense = jnp.matmul(
        wy, jnp.matmul(x, wx.T, precision=lax.Precision.HIGHEST),
        precision=lax.Precision.HIGHEST,
    )
    t = resample_cols_blocked(x, out_bucket[1], out_hw[1], in_hw[1])
    blocked = resample_rows_blocked(t, out_bucket[0], out_hw[0], in_hw[0])
    assert blocked.shape == out_bucket
    np.testing.assert_allclose(
        np.asarray(blocked), np.asarray(dense), atol=2e-4,
        err_msg="block-banded vs dense",
    )
    # Batched form (frames stacked) matches too.
    xb = jnp.stack([x, 2.0 * x])
    tb = resample_cols_blocked(xb, out_bucket[1], out_hw[1], in_hw[1])
    bb = resample_rows_blocked(tb, out_bucket[0], out_hw[0], in_hw[0])
    np.testing.assert_allclose(np.asarray(bb[0]), np.asarray(blocked),
                               atol=1e-6)


# ---------------------------------------------------------------- warp


def test_warp_zero_flow_is_frame1():
    f0, f1 = rand(8, 11), rand(8, 11)
    z = np.zeros_like(f0)
    got = np.asarray(warp(f0, f1, z, z, 1.0, 1.0))
    np.testing.assert_array_equal(got, f1)


def test_warp_matches_oracle_including_oob():
    f0, f1 = rand(9, 12, 255.0), rand(9, 12, 255.0)
    u = (RNG.random((9, 12), dtype=np.float32) - 0.5) * 20.0  # some go OOB
    v = (RNG.random((9, 12), dtype=np.float32) - 0.5) * 20.0
    for hx, hy in [(1.0, 1.0), (1.7, 2.3)]:
        want = oracle.warp(f0, f1, u, v, hx, hy)
        got = np.asarray(warp(f0, f1, u, v, hx, hy))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-4)


def test_warp_nan_flow_copies_frame0():
    f0, f1 = rand(4, 4), rand(4, 4)
    u = np.full((4, 4), np.nan, np.float32)
    v = np.zeros((4, 4), np.float32)
    got = np.asarray(warp(f0, f1, u, v, 1.0, 1.0))
    np.testing.assert_array_equal(got, f0)


# ---------------------------------------------------------------- median


@pytest.mark.parametrize("radius", [3, 5, 7])
def test_median_matches_oracle(radius):
    img = rand(11, 14, 100.0)
    want = oracle.median(img, radius)
    got = np.asarray(median(img, radius))
    np.testing.assert_array_equal(got, want)


def test_median_radius_one_is_copy():
    img = rand(5, 5)
    np.testing.assert_array_equal(np.asarray(median(img, 1)), img)


def test_median_even_radius_decrements():
    img = rand(9, 9)
    np.testing.assert_array_equal(np.asarray(median(img, 4)), np.asarray(median(img, 3)))


def test_median_rejects_large_radius():
    with pytest.raises(ValueError):
        median(rand(9, 9), 9)


# ---------------------------------------------------------------- solver ops


def _solver_inputs(h=10, w=13):
    f0 = rand(h, w, 255.0)
    f1 = (f0 + rand(h, w, 5.0)).astype(np.float32)
    u = (rand(h, w) - 0.5).astype(np.float32)
    v = (rand(h, w) - 0.5).astype(np.float32)
    du = (rand(h, w) * 0.1).astype(np.float32)
    dv = (rand(h, w) * 0.1).astype(np.float32)
    return f0, f1, u, v, du, dv


def test_phi_ksi_matches_oracle():
    f0, f1, u, v, du, dv = _solver_inputs()
    for hx, hy in [(1.0, 1.0), (1.3, 1.9)]:
        want_phi, want_ksi = oracle.compute_phi_ksi(
            f0, f1, u, v, du, dv, hx, hy, 0.001, 0.001
        )
        got_phi, got_ksi = compute_phi_ksi(f0, f1, u, v, du, dv, hx, hy, 0.001, 0.001)
        np.testing.assert_allclose(np.asarray(got_phi), want_phi, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(got_ksi), want_ksi, rtol=1e-4)


@pytest.mark.parametrize(
    "constancy,oracle_fn",
    [
        (DataConstancy.GREY, oracle.solve_sweep_grey),
        (DataConstancy.GRADIENT, oracle.solve_sweep_grad),
        (DataConstancy.LOG_DERIVATIVES, oracle.solve_sweep_log),
    ],
)
def test_sweep_matches_oracle(constancy, oracle_fn):
    f0, f1, u, v, du, dv = _solver_inputs()
    phi, ksi = oracle.compute_phi_ksi(f0, f1, u, v, du, dv, 1.0, 1.0, 0.001, 0.001)
    want_du, want_dv = oracle_fn(f0, f1, u, v, du, dv, phi, ksi, 1.0, 1.0, 35.0)
    got_du, got_dv = solve_sweep(
        f0, f1, u, v, du, dv, phi, ksi, 1.0, 1.0, 35.0, constancy
    )
    np.testing.assert_allclose(np.asarray(got_du), want_du, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_dv), want_dv, rtol=2e-4, atol=1e-5)


def test_sweep_free_boundary_masks():
    # A constant-flow field with zero data term must stay fixed under the
    # sweep: neighbors cancel and edge weights are masked.
    h, w = 6, 7
    f0 = np.zeros((h, w), np.float32)
    f1 = np.zeros((h, w), np.float32)  # fx=fy=ft=0 -> pure smoothness
    u = np.full((h, w), 2.5, np.float32)
    v = np.full((h, w), -1.5, np.float32)
    du = np.zeros((h, w), np.float32)
    dv = np.zeros((h, w), np.float32)
    phi = np.full((h, w), 0.7, np.float32)
    ksi = np.full((h, w), 0.3, np.float32)
    got_du, got_dv = solve_sweep(
        f0, f1, u, v, du, dv, phi, ksi, 1.0, 1.0, 35.0, DataConstancy.GREY
    )
    np.testing.assert_allclose(np.asarray(got_du), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_dv), 0.0, atol=1e-6)
