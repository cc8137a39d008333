"""THE per-pixel Jacobi sweep update — single source of truth.

Every engine (XLA scan path, Pallas full/chunked/whole-level kernels,
the sharded ppermute block, the RDMA-halo kernel) runs the same coupled
point update (reference math: src/kernels/solve_2d.cu:361-367):

    sumU   = sum_i pw_i (T_i - u_c)           (smoothness, 4 neighbors)
    new_du = (-a13 - a12 * dv_c + sumU) / dnu
    new_dv = (-a23 - a12 * new_du + sumV) / dnv   (fresh du - Gauss-Seidel
                                                   coupling inside the pair)

in one of two algebraic forms that the round-2 verdict found duplicated
across six call sites ("numerics changes here must be mirrored there"):

  * T-form (`sweep_update_T`): the iterate is T = flow + d; neighbors
    enter recentered (T_i - u_c), the data terms a13/a23 are the
    ksi-scaled tensor entries.
  * du-form (`sweep_update_du`): the iterate is d itself; the per-outer
    constants cu/cv are pre-folded into bu/bv (ops/pallas/relax_du.py
    module docstring derives the exact split).

These helpers are pure jnp expression builders — they trace identically
inside XLA jit, shard_map bodies and Pallas kernels, so substituting
them for the inline copies produces the SAME program (verified by the
kernel parity-matrix tests and the bench EPE gate). Association order is
load-bearing: these engines are pinned against each other at the 1-ulp
level, so any change here must re-run the full parity matrix
(tests/test_relax_du.py, test_level_fused.py, test_halo*.py).

Variant-specific concerns stay at the call sites: how neighbors are
produced (concat shifts, rolls, chunk slabs, halo pads), ghost/mirror
maintenance, and buffer ping-pong. The ONLY permitted algebraic switch
is `recip=True` (multiply by hoisted reciprocals instead of dividing), a
bench-only A/B (measured ~flat, BASELINE.md "sweep reciprocal hoist").

The per-shape engine's unhoisted form (ops/solver_ops.py:342-343,
`ksi*(-J13 - J12*dv) + sumU) / (ksi*J11 + sumH)`) is intentionally NOT
unified: it reproduces the reference's own operation order for
oracle-anchored testing and differs from the hoisted form at 1 ulp.
"""

from __future__ import annotations


def smoothness_sum(pw, nb, center=None):
    """sum_i pw_i * (nb_i - center), or sum_i pw_i * nb_i when center is
    None (du-form: the recentering constant is folded into bu/bv).

    pw = (pw_xp, pw_xm, pw_yp, pw_ym) half-point diffusivity weights,
    nb = neighbor values in the SAME order. Left-associated exactly as
    every engine wrote it inline."""
    pw_xp, pw_xm, pw_yp, pw_ym = pw
    n_xp, n_xm, n_yp, n_ym = nb
    if center is None:
        return pw_xp * n_xp + pw_xm * n_xm + pw_yp * n_yp + pw_ym * n_ym
    return (
        pw_xp * (n_xp - center)
        + pw_xm * (n_xm - center)
        + pw_yp * (n_yp - center)
        + pw_ym * (n_ym - center)
    )


def sweep_update_T(nb_tu, nb_tv, u_c, v_c, dv_c, pw, a12, a13, a23,
                   dnu, dnv, *, recip=False):
    """T-form update. nb_tu/nb_tv: (xp, xm, yp, ym) neighbor values of
    the combined iterates Tu/Tv; u_c/v_c: center flow; dv_c: the CENTER
    v-displacement (Tv_c - v_c, or the raw dv iterate on the XLA path —
    the same value). Returns (new_du, new_dv) DISPLACEMENTS; callers add
    u_c/v_c back where the stored iterate is T."""
    sumU = smoothness_sum(pw, nb_tu, u_c)
    sumV = smoothness_sum(pw, nb_tv, v_c)
    if recip:
        new_du = (-a13 - a12 * dv_c + sumU) * dnu
        new_dv = (-a23 - a12 * new_du + sumV) * dnv
    else:
        new_du = (-a13 - a12 * dv_c + sumU) / dnu
        new_dv = (-a23 - a12 * new_du + sumV) / dnv
    return new_du, new_dv


def sweep_update_du(nb_du, nb_dv, dv_c, pw, a12, bu, bv, dnu, dnv):
    """du-form update: iterate neighbors enter unrecentered, bu/bv carry
    -a13 + cu (+ the per-outer folds). Returns (new_du, new_dv)."""
    sdu = smoothness_sum(pw, nb_du)
    sdv = smoothness_sum(pw, nb_dv)
    new_du = (bu - a12 * dv_c + sdu) / dnu
    new_dv = (bv - a12 * new_du + sdv) / dnv
    return new_du, new_dv
