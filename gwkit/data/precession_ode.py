"""Two-spin orbit-averaged precession angles by direct ODE integration.

The closed-form angles in :mod:`gwkit.data.imrphenomp` are the LEADING-ORDER
single-spin (Apostolatos et al. 1994) solution: in-plane spin enters only
through the scalar chi_p placed on the larger body, and the precession-cone
geometry is fixed by (L + S_z, chi_p m1^2). The reference's IMRPhenomXPHM
(lalsuite, used by /root/reference/MLGWSC-1/gen.py:131-147) instead carries
BOTH spin vectors through the (MSA/NNLO) Euler angles. This module closes
that gap the verifiable way available in a zero-egress environment: rather
than transcribing the published NNLO coefficient tables (which cannot be
cross-checked against lalsuite here), it integrates the standard
orbit-averaged spin-precession equations (Kidder 1995, eq. 2.4; Apostolatos
et al. 1994, eq. 2) directly,

  dS1/dt = Omega1 x S1,
  Omega1 = (1/r^3) [ (2 + 3 m2 / (2 m1)) L_N
                     + 1/2 S2 - 3/2 (Lhat . S2) Lhat ],   (1 <-> 2 for S2)
  dLhat/dt = -(dS1/dt + dS2/dt)_perp / |L_N|,

with Newtonian L_N = (eta/v) Lhat (units G = c = M_total = 1), r = v^-2, and
quadrupole radiation reaction dv/dt = (32/5) eta v^9 carrying the system
through frequency. This keeps spin-orbit AND spin-spin couplings of both
spins, exactly conserves |S1|, |S2| (tested), and approximately conserves
the total J direction (tested) — the physics the single-spin closed form
truncates. Fixed-step RK4 inside ``lax.scan`` keeps the whole solve
jit/vmap-compatible with static shapes (TPU-friendly: no adaptive stepping,
no data-dependent control flow). The integration variable is u = v^-3, NOT
v: the precession rate per unit v scales as dalpha/dv ~ v^-4 (Omega_p dt/dv
with Omega_p ~ v^5/M and dt/dv ~ M v^-10 / eta), so a uniform v-grid packs
its resolution into the late inspiral where alpha barely moves and
under-resolves the early band — at low total mass the per-step azimuth
advance exceeded pi there, silently aliasing the arctan2 unwrap below.
du = -3 v^-4 dv cancels that scaling: uniform u steps advance alpha by a
roughly CONSTANT angle each, so the same n_steps buys resolution where the
precession actually happens (verified by the convergence test against a
16x-oversampled reference).

Frame/gauge conventions match :func:`gwkit.data.imrphenomp.precession_angles`
so the two models are drop-in interchangeable as ``angle_fn`` inputs to the
twist constructors:

* spins are given in the source frame where Lhat(f_ref) = z (LAL convention);
* angles are reported in the frame where the TOTAL J(f_ref) is the z-axis;
* alpha(f_ref) = alpha0, and the minimal-rotation epsilon is gauged to
  eps(f_ref) = alpha(f_ref);
* below f_ref and above the integrated band the angles are held at their
  edge values (the closed form clamps the grid at f_ref/2 similarly).

Validation boundary (tested in tests/test_precession_ode.py): exact aligned
reduction (beta = 0, alpha frozen), |S_i| conservation through merger-band
v, J-direction stability, agreement of d(alpha)/dv with the closed-form
leading-order rate in the single-spin small-opening-angle regime, and a
genuine two-spin effect (S2-in-plane changes the angles where chi_p cannot).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from gwkit.data.imrphenomp import MTSUN_SI

Angles = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]


def _rotation_to_z(vec):
    """3x3 rotation matrix taking unit vector ``vec`` to +z (Rodrigues).

    Degenerates gracefully: vec already +z gives the identity; vec = -z is
    regularized through the clamp on (1 + cos) (an axis convention choice,
    irrelevant in practice — J anti-aligned with L at f_ref does not occur
    for the challenge populations).
    """
    v = vec / jnp.linalg.norm(vec)
    z = jnp.array([0.0, 0.0, 1.0], v.dtype)
    axis = jnp.cross(v, z)
    s2 = jnp.dot(axis, axis)                       # sin^2(angle)
    c = jnp.dot(v, z)
    # R = I + [axis]_x + [axis]_x^2 /(1+c); guard both degenerate limits
    k = jnp.where(s2 > 1e-14, 1.0 / jnp.maximum(1.0 + c, 1e-7), 0.0)
    ax = jnp.array([
        [0.0, -axis[2], axis[1]],
        [axis[2], 0.0, -axis[0]],
        [-axis[1], axis[0], 0.0],
    ])
    return jnp.eye(3, dtype=v.dtype) + ax + k * (ax @ ax)


def _derivs(lhat, s1, s2, v, m1f, m2f, eta):
    """(dLhat/dv, dS1/dv, dS2/dv) in total-mass units at PN speed ``v``."""
    ldot_s2 = jnp.dot(lhat, s2)
    ldot_s1 = jnp.dot(lhat, s1)
    om1 = v ** 6 * ((2.0 + 1.5 * m2f / m1f) * (eta / v) * lhat
                    + 0.5 * s2 - 1.5 * ldot_s2 * lhat)
    om2 = v ** 6 * ((2.0 + 1.5 * m1f / m2f) * (eta / v) * lhat
                    + 0.5 * s1 - 1.5 * ldot_s1 * lhat)
    dvdt = (32.0 / 5.0) * eta * v ** 9
    ds1 = jnp.cross(om1, s1) / dvdt
    ds2 = jnp.cross(om2, s2) / dvdt
    dsum = ds1 + ds2
    # momentum balance: Ldot = -(S1dot + S2dot); precession preserves |L|,
    # so only the transverse part moves the direction
    dl = -(dsum - jnp.dot(dsum, lhat) * lhat) / (eta / v)
    return dl, ds1, ds2


def integrate_precession(
    m1, m2, s1_vec, s2_vec, f_ref: float, f_max: float, n_steps: int = 384
):
    """Integrate Lhat/S1/S2 from f_ref to f_max on a grid uniform in v^-3.

    ``s1_vec``/``s2_vec`` are the DIMENSIONLESS spin vectors chi_i in the
    frame where Lhat(f_ref) = z. Returns ``(v_grid, lhat, s1, s2)`` with
    ``lhat`` of shape (n_steps + 1, 3) etc., expressed in that same frame
    (no J-rotation applied here). |S_i| is exactly conserved by the
    projected RK4 + renormalization scheme up to integration error.

    The grid is uniform in u = v^-3 (see module docstring): dalpha/du is
    ~constant across the band, so every RK4 step subtends a comparable
    precession angle — a uniform-v grid under-resolved the early inspiral
    (where almost all the precession cycles live) badly enough to alias
    the downstream azimuth unwrap for low total masses.
    """
    m1 = jnp.asarray(m1, jnp.float32)
    m2 = jnp.asarray(m2, jnp.float32)
    mtot = m1 + m2
    m1f = m1 / mtot
    m2f = m2 / mtot
    eta = m1f * m2f
    mt_s = mtot * MTSUN_SI
    v_lo = (jnp.pi * mt_s * f_ref) ** (1.0 / 3.0)
    # integrate at most to v = 1 (the twist holds angles fixed beyond);
    # f_max is static so this is a static grid
    v_hi = jnp.minimum((jnp.pi * mt_s * f_max) ** (1.0 / 3.0), 1.0)
    v_hi = jnp.maximum(v_hi, v_lo * (1.0 + 1e-6))
    u_lo = v_lo ** -3.0
    u_hi = v_hi ** -3.0
    du = (u_hi - u_lo) / n_steps  # negative: u decreases as v grows

    s1_0 = jnp.asarray(s1_vec, jnp.float32) * m1f ** 2
    s2_0 = jnp.asarray(s2_vec, jnp.float32) * m2f ** 2
    l_0 = jnp.array([0.0, 0.0, 1.0], jnp.float32)

    def derivs_u(lhat, s1, s2, u):
        v = jnp.maximum(u, 1.0) ** (-1.0 / 3.0)
        dl, ds1, ds2 = _derivs(lhat, s1, s2, v, m1f, m2f, eta)
        dvdu = -(v ** 4) / 3.0
        return dl * dvdu, ds1 * dvdu, ds2 * dvdu

    def step(carry, i):
        lhat, s1, s2 = carry
        u = u_lo + i * du

        k1 = derivs_u(lhat, s1, s2, u)
        k2 = derivs_u(lhat + 0.5 * du * k1[0], s1 + 0.5 * du * k1[1],
                      s2 + 0.5 * du * k1[2], u + 0.5 * du)
        k3 = derivs_u(lhat + 0.5 * du * k2[0], s1 + 0.5 * du * k2[1],
                      s2 + 0.5 * du * k2[2], u + 0.5 * du)
        k4 = derivs_u(lhat + du * k3[0], s1 + du * k3[1],
                      s2 + du * k3[2], u + du)

        def comb(a, b, c, d):
            return (a + 2.0 * b + 2.0 * c + d) * (du / 6.0)

        lhat_n = lhat + comb(k1[0], k2[0], k3[0], k4[0])
        lhat_n = lhat_n / jnp.linalg.norm(lhat_n)
        s1_n = s1 + comb(k1[1], k2[1], k3[1], k4[1])
        s2_n = s2 + comb(k1[2], k2[2], k3[2], k4[2])
        # precession torques conserve the spin magnitudes exactly;
        # re-impose them so RK4 drift cannot accumulate
        def fix_norm(s, s0):
            n0 = jnp.linalg.norm(s0)
            n = jnp.linalg.norm(s)
            return jnp.where(n0 > 0.0, s * (n0 / jnp.maximum(n, 1e-30)), s)
        s1_n = fix_norm(s1_n, s1_0)
        s2_n = fix_norm(s2_n, s2_0)
        new = (lhat_n, s1_n, s2_n)
        return new, new

    init = (l_0, s1_0, s2_0)
    _, traj = jax.lax.scan(step, init, jnp.arange(n_steps, dtype=jnp.float32))
    lhat = jnp.concatenate([l_0[None], traj[0]], axis=0)
    s1 = jnp.concatenate([s1_0[None], traj[1]], axis=0)
    s2 = jnp.concatenate([s2_0[None], traj[2]], axis=0)
    u_grid = u_lo + du * jnp.arange(n_steps + 1, dtype=jnp.float32)
    v_grid = jnp.maximum(u_grid, 1.0) ** (-1.0 / 3.0)
    return v_grid, lhat, s1, s2


def precession_angles_numerical(
    m1, m2, s1_vec, s2_vec, alpha0=0.0,
    f_ref: float = 20.0, f_max: float = 1024.0, n_steps: int = 384,
) -> Callable[[jnp.ndarray], Angles]:
    """Build an ``angle_fn(freqs) -> (alpha, cos_beta, eps)`` closure.

    The ODE is integrated ONCE per waveform on a uniform v-grid; the
    returned closure interpolates (alpha, cos_beta, eps) onto any GW
    frequency grid — the XPHM twist calls it at the (2/m)-mapped frequency
    of every mode, reusing the same orbital precession history.

    Angles are expressed in the frame where total J(f_ref) is the z-axis,
    with alpha(f_ref) = alpha0 and eps(f_ref) = alpha(f_ref) — the same
    conventions as the closed-form
    :func:`gwkit.data.imrphenomp.precession_angles`.
    """
    v_grid, lhat, s1, s2 = integrate_precession(
        m1, m2, s1_vec, s2_vec, f_ref, f_max, n_steps)
    mtot = jnp.asarray(m1, jnp.float32) + jnp.asarray(m2, jnp.float32)
    eta = (m1 * m2) / mtot ** 2
    # rotate everything into the J(f_ref)-aligned frame
    j0 = (eta / v_grid[0]) * lhat[0] + s1[0] + s2[0]
    rot = _rotation_to_z(j0)
    lhat_j = lhat @ rot.T

    lx, ly, lz = lhat_j[:, 0], lhat_j[:, 1], lhat_j[:, 2]
    cos_b = jnp.clip(lz, -1.0, 1.0)
    # branch-cut-free azimuth accumulation: the signed angle between
    # consecutive planar projections of Lhat (valid while |step| < pi —
    # guaranteed by the uniform-u grid, which subtends a roughly constant,
    # small alpha per step; the uniform-v grid this replaced violated it
    # at low total mass). atan2(0, 0) = 0 on XLA, so the aligned limit
    # freezes alpha exactly
    cross = lx[:-1] * ly[1:] - ly[:-1] * lx[1:]
    dot = lx[:-1] * lx[1:] + ly[:-1] * ly[1:]
    d_alpha = jnp.arctan2(cross, dot)
    alpha = alpha0 + jnp.concatenate(
        [jnp.zeros((1,), d_alpha.dtype), jnp.cumsum(d_alpha)])
    # minimal-rotation condition d(eps) = cos(beta) d(alpha), midpoint rule
    d_eps = 0.5 * (cos_b[:-1] + cos_b[1:]) * d_alpha
    eps = jnp.concatenate([jnp.zeros((1,), d_eps.dtype), jnp.cumsum(d_eps)])
    eps = eps + (alpha[0] - eps[0])

    mt_s = mtot * MTSUN_SI

    def angle_fn(freqs: jnp.ndarray) -> Angles:
        v = (jnp.pi * mt_s * jnp.maximum(freqs, 1e-6)) ** (1.0 / 3.0)
        v = jnp.clip(v, v_grid[0], v_grid[-1])
        shape = jnp.shape(v)
        vq = jnp.reshape(v, (-1,))
        a = jnp.interp(vq, v_grid, alpha)
        cb = jnp.interp(vq, v_grid, cos_b)
        e = jnp.interp(vq, v_grid, eps)
        return (jnp.reshape(a, shape), jnp.reshape(cb, shape),
                jnp.reshape(e, shape))

    return angle_fn
