"""In-kernel ring-RDMA sharded relaxation (parallel/halo_kernel) on the
8-virtual-device CPU mesh, Pallas interpret mode (which executes the
remote copies and semaphores across the mesh).

Equivalence bounds follow test_halo.py: sharded and unsharded are
different programs, so 1-ulp mult-add contraction differences are
amplified at phi-sensitive pixels on random fields; the kernel's
divergence was measured to TRACK the verified explicit-ppermute path
within ~2x at every (outer, inner) probed (mean 2.1e-6 vs 2.0e-6 at
outer=3, 2.14e-3 vs 2.08e-3 at outer=40 — BASELINE.md), so the bounds
pin mean EPE at small outer counts where the band is tight.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpuflow.config import DataConstancy, FlowConfig
from tpuflow.parallel.halo_kernel import (
    kernel_halo_applicable,
    relax_sharded_kernel,
)
from tpuflow.solver.bucketed import (
    LevelScalars,
    _relax_dyn,
    maintain_mirror1,
)


def setup(HB=128, WB=256, cw=200, ch=100, seed=7):
    rng = np.random.default_rng(seed)

    def mkfield(scale=1.0, base=0.0):
        a = np.zeros((HB, WB), np.float32)
        a[:ch, :cw] = rng.random((ch, cw), dtype=np.float32) * scale + base
        return jnp.asarray(a)

    sc = LevelScalars.make(cw, ch, 1.3, 1.7, 35.0, 584, 388, cw, ch)
    f0 = maintain_mirror1(mkfield(255.0), sc.cw, sc.ch)
    f1 = maintain_mirror1(f0 + mkfield(8.0), sc.cw, sc.ch)
    u = maintain_mirror1(mkfield(1.0, -0.5), sc.cw, sc.ch)
    v = maintain_mirror1(mkfield(1.0, -0.5), sc.cw, sc.ch)
    return f0, f1, u, v, sc.tree(), (cw, ch)


def mesh_1d(n=4):
    return Mesh(np.array(jax.devices()[:n]), ("y",))


@pytest.mark.parametrize("constancy", list(DataConstancy))
def test_kernel_matches_unsharded(constancy):
    cfg = FlowConfig(outer_iterations_count=3, inner_iterations_count=2,
                     data_constancy=constancy)
    f0, f1, u, v, sc, (cw, ch) = setup()
    du_a, dv_a = map(
        np.asarray, _relax_dyn(f0, f1, u, v, sc, cfg, use_pallas=False)
    )
    du, dv = map(np.asarray, relax_sharded_kernel(
        f0, f1, u, v, sc, cfg, mesh_1d(), interpret=True))
    d = np.hypot(du[:ch, :cw] - du_a[:ch, :cw], dv[:ch, :cw] - dv_a[:ch, :cw])
    assert d.mean() < 5e-5 and d.max() < 2e-2, (d.mean(), d.max())


@pytest.mark.parametrize("k", [2, 5])
def test_kernel_k_outer_fusion_bit_matches_k1(k):
    """k-outer fusion in the RDMA kernel (VERDICT r3 #2): one exchange
    per k fused outers with a k*(inner+1)-row halo (8-rounded), per-outer
    top_fill/maintain upkeep in between. Valid rows are BIT-IDENTICAL to
    the per-outer-exchange kernel: every shard runs the same expression
    order, so redundantly recomputing a halo row from true inputs yields
    exactly the bits the neighbor computed for its owned copy."""
    cfg = FlowConfig(outer_iterations_count=10, inner_iterations_count=2)
    f0, f1, u, v, sc, (cw, ch) = setup(seed=3)
    du1, dv1 = map(np.asarray, relax_sharded_kernel(
        f0, f1, u, v, sc, cfg, mesh_1d(), k_outer=1, interpret=True))
    du, dv = map(np.asarray, relax_sharded_kernel(
        f0, f1, u, v, sc, cfg, mesh_1d(), k_outer=k, interpret=True))
    np.testing.assert_array_equal(du[:ch, :cw], du1[:ch, :cw])
    np.testing.assert_array_equal(dv[:ch, :cw], dv1[:ch, :cw])


def test_kernel_k_outer_gate():
    """The VMEM/shard-size gate scales with k: wider halos need bigger
    shards and a bigger padded working set."""
    cfg = FlowConfig(inner_iterations_count=5)      # halo(k) = 8*ceil(6k/8)
    assert kernel_halo_applicable(128, 256, 4, cfg, k_outer=2)   # 32 >= 16-rounded 12
    assert not kernel_halo_applicable(128, 256, 4, cfg, k_outer=6)  # halo 40 > 32 rows/shard


def test_kernel_2d_mesh():
    """MESH-dict device ids: the same kernel must run (and agree) on a
    dp x sp 2-D mesh — LOGICAL ids would address the wrong device there
    (jax raises NotImplementedError for >1 named axis)."""
    cfg = FlowConfig(outer_iterations_count=3, inner_iterations_count=3)
    f0, f1, u, v, sc, (cw, ch) = setup(seed=11)
    du_a, dv_a = map(
        np.asarray, _relax_dyn(f0, f1, u, v, sc, cfg, use_pallas=False)
    )
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "y"))
    du, dv = map(np.asarray, relax_sharded_kernel(
        f0, f1, u, v, sc, cfg, mesh, interpret=True))
    d = np.hypot(du[:ch, :cw] - du_a[:ch, :cw], dv[:ch, :cw] - dv_a[:ch, :cw])
    assert d.mean() < 5e-5 and d.max() < 2e-2, (d.mean(), d.max())


def test_no_xla_collectives():
    """The collective contract: ALL communication is in-kernel RDMA — the
    traced program contains zero XLA collectives (the explicit path pins
    4 ppermutes/outer; this one pins 0)."""
    cfg = FlowConfig(outer_iterations_count=3, inner_iterations_count=2)
    f0, f1, u, v, sc, _ = setup()
    jaxpr = str(jax.make_jaxpr(
        lambda a, b, uu, vv: relax_sharded_kernel(
            a, b, uu, vv, sc, cfg, mesh_1d(), interpret=True)
    )(f0, f1, u, v))
    assert "ppermute" not in jaxpr and "all_gather" not in jaxpr
    assert "psum" not in jaxpr.replace("psum_invariant", "")
    assert jaxpr.count("pallas_call") == 1


def test_gate():
    cfg = FlowConfig()  # inner=5 -> halo rows 8 (tile-rounded 6)
    # rub fine bucket over 4 shards: 112 rows/shard, fits.
    assert kernel_halo_applicable(448, 640, 4, cfg)
    # 8 rows/shard: too small.
    assert not kernel_halo_applicable(64, 640, 8, cfg)
    # 1080p fine bucket over 4: 32 padded fields x 288 x 2048 = 75 MB, fits.
    assert kernel_halo_applicable(1088, 2048, 4, cfg)
    # 4K fine bucket: per-shard padded set blows VMEM even over 8.
    assert not kernel_halo_applicable(2176, 3968, 4, cfg)
    assert not kernel_halo_applicable(2176, 3968, 8, cfg)
    assert not kernel_halo_applicable(
        448, 640, 4, FlowConfig(inner_iterations_count=0))


def test_pipeline_routes_kernel():
    """halo='kernel' in the sharded pipeline: admitted buckets get the
    RDMA kernel, the rest fall back explicit -> replicate, and the
    pipeline's flow stays equivalent to the unsharded solve."""
    from tpuflow.solver.bucketed import (
        compute_flow_bucketed_async,
        compute_flow_bucketed_sharded,
    )
    from tpuflow.solver.flow2d import endpoint_error

    rng = np.random.default_rng(3)
    h, w = 120, 200
    f0 = (rng.random((h, w), np.float32) * 200).astype(np.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    g = 150 * np.exp(-((ys - 60) ** 2 + (xs - 90) ** 2) / 200.0)
    f0 += g
    f1 = f0 + np.roll(g, (2, 1), axis=(0, 1)) - g
    cfg = FlowConfig(warp_levels_count=4, outer_iterations_count=6,
                     inner_iterations_count=2)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4), ("data", "y"))
    u0, v0 = map(np.asarray, compute_flow_bucketed_async(
        jnp.asarray(f0), jnp.asarray(f1), cfg))
    uk, vk = map(np.asarray, compute_flow_bucketed_sharded(
        f0, f1, cfg, mesh=mesh, halo="kernel"))
    assert endpoint_error(uk, vk, u0, v0) < 1e-4
