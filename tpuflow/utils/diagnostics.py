"""Solver diagnostics: the variational energy of a flow field.

The reference has no quantitative convergence observability (printf progress
only); this evaluates the robust energy functional the solver minimizes
(reference model: README.md:30-38, kernel math solve_2d.cu §2.5):

    E(u, v) = sum psi( (du,dv,1)^T J (du,dv,1) )          [data term]
            + alpha * sum psi( |grad u|^2 + |grad v|^2 )  [smoothness]

with psi(s) = sqrt(s + eps^2) (the sub-quadratic penalizer whose
half-derivative is the reference's phi/ksi = 1/(2 sqrt(...))). Useful for
convergence monitoring, schedule tuning, and regression tests (energy must
not increase across outer iterations).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpuflow.config import DataConstancy, FlowConfig
from tpuflow.ops.solver_ops import _motion_tensor, _shifts


class FlowEnergy(NamedTuple):
    data: jax.Array       # scalar
    smoothness: jax.Array  # scalar
    total: jax.Array      # data + alpha * smoothness


def flow_energy(
    f0, f1, u, v, cfg: FlowConfig = None, hx: float = 1.0, hy: float = 1.0
) -> FlowEnergy:
    """Evaluate the robust variational energy of (u, v) on a frame pair.

    Frames and flow at the same (H, W); flow in original-pixel units like
    the solver (converted by 1/h internally). The data term uses the
    motion tensor of cfg.data_constancy; the quadratic form is evaluated
    at displacement (u/hx, v/hy) like the warped incremental solve with
    du = u (zero prior flow).
    """
    cfg = cfg or FlowConfig()
    f0 = jnp.asarray(f0, jnp.float32)
    f1 = jnp.asarray(f1, jnp.float32)
    u = jnp.asarray(u, jnp.float32) * jnp.float32(1.0 / hx)
    v = jnp.asarray(v, jnp.float32) * jnp.float32(1.0 / hy)

    J11, J22, J12, J13, J23 = _motion_tensor(f0, f1, hx, hy, cfg.data_constancy)
    # J33 from the grey tensor (the constant term of the quadratic form).
    ft = _shifts(f1)[0] - _shifts(f0)[0]
    J33 = ft * ft

    s = (
        (J11 * u + J12 * v + J13) * u
        + (J12 * u + J22 * v + J23) * v
        + (J13 * u + J23 * v + J33)
    )
    s = jnp.maximum(s, 0.0)
    e_d = jnp.float32(cfg.equation_data)
    data = jnp.sum(jnp.sqrt(s + e_d * e_d))

    _, u_xp, u_xm, u_yp, u_ym = _shifts(u)
    _, v_xp, v_xm, v_yp, v_ym = _shifts(v)
    ux = (u_xp - u_xm) / jnp.float32(2.0 * hx)
    uy = (u_yp - u_ym) / jnp.float32(2.0 * hy)
    vx = (v_xp - v_xm) / jnp.float32(2.0 * hx)
    vy = (v_yp - v_ym) / jnp.float32(2.0 * hy)
    e_s = jnp.float32(cfg.equation_smoothness)
    smooth = jnp.sum(jnp.sqrt(ux * ux + uy * uy + vx * vx + vy * vy + e_s * e_s))

    total = data + jnp.float32(cfg.equation_alpha) * smooth
    return FlowEnergy(data=data, smoothness=smooth, total=total)
