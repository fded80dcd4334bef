"""Mueller/Stokes polarization algebra.

TPU-first counterpart of the reference's Mueller-matrix utility library
(`include/mitsuba/render/mueller.h`) and the polarized Fresnel equations
(`include/mitsuba/render/fresnel.h:227` `fresnel_polarized`). Everything
here is pure `jnp`, fully vmap/grad-compatible.

Conventions (identical to the reference, `mueller.h:10-27`):
  * Light polarization state is a Stokes vector, observed from the sensor
    side looking back *against* the propagation direction.
  * A Stokes vector is only meaningful together with a reference basis
    orthogonal to the propagation direction. Bases are never stored;
    `stokes_basis(d)` derives the implicit basis for direction `d`
    deterministically (first tangent of the Duff orthonormal frame — the
    same construction the reference uses via `coordinate_system`,
    `mueller.h:284-287`).
  * Mueller matrices here have shape (..., C, 4, 4) where C is the number
    of spectral channels; Stokes vectors are (..., C, 4). Channel-
    independent rotations broadcast with a singleton C axis.

Shapes: all constructors accept scalars or arrays and broadcast; the
returned matrix appends (4, 4) to the broadcast value shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .math import coordinate_system


def _mm(rows):
    """Assemble a (..., 4, 4) matrix from 16 broadcastable entries."""
    rows = [[jnp.asarray(e, jnp.float32) for e in r] for r in rows]
    shape = jnp.broadcast_shapes(*[e.shape for r in rows for e in r])
    return jnp.stack(
        [jnp.stack([jnp.broadcast_to(e, shape) for e in r], axis=-1)
         for r in rows], axis=-2)


def matmul(a, b):
    """Mueller matrix product (batched over leading dims incl. channels).

    Forced to full-f32 precision: XLA lowers even 4x4 matmuls onto the
    MXU, whose default f32 mode truncates inputs to bf16 (~2e-3 relative)
    — enough to break the S0 == scalar-render invariant (see
    `ops/math.py::mat3_apply` for the same hazard in geometry code)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def apply_stokes(m, s):
    """Apply a (..., 4, 4) Mueller matrix to a (..., 4) Stokes vector."""
    return jnp.einsum("...ij,...j->...i", m, s,
                      precision=jax.lax.Precision.HIGHEST)


def depolarizer(value=1.0):
    """Ideal depolarizer: only the (0,0) entry (`mueller.h:37-41`)."""
    v = jnp.asarray(value, jnp.float32)
    z = jnp.zeros_like(v)
    return _mm([[v, z, z, z], [z, z, z, z], [z, z, z, z], [z, z, z, z]])


def absorber(value):
    """Neutral attenuation: `value * I` (`mueller.h:50-52`). Returned as a
    scale factor to multiply matrices with (append two singleton dims)."""
    return jnp.asarray(value, jnp.float32)[..., None, None]


def linear_polarizer(value=1.0):
    """Linear polarizer transmitting at 0 deg; Collett Ch.5 eq. (13)
    (`mueller.h:65-73`)."""
    a = jnp.asarray(value, jnp.float32) * 0.5
    z = jnp.zeros_like(a)
    return _mm([[a, a, z, z], [a, a, z, z], [z, z, z, z], [z, z, z, z]])


def linear_retarder(phase):
    """Linear retarder, fast axis horizontal; Goldstein eq. (6.43)
    (`mueller.h:91-100`)."""
    s, c = jnp.sin(phase), jnp.cos(phase)
    o = jnp.ones_like(s)
    z = jnp.zeros_like(s)
    return _mm([[o, z, z, z], [z, o, z, z], [z, z, c, s], [z, z, -s, c]])


def right_circular_polarizer():
    """Chipman et al., Table 6.2 (`mueller.h:108-115`)."""
    return 0.5 * jnp.array([[1, 0, 0, 1], [0, 0, 0, 0],
                            [0, 0, 0, 0], [1, 0, 0, 1]], jnp.float32)


def left_circular_polarizer():
    """Chipman et al., Table 6.2 (`mueller.h:123-130`)."""
    return 0.5 * jnp.array([[1, 0, 0, -1], [0, 0, 0, 0],
                            [0, 0, 0, 0], [-1, 0, 0, 1]], jnp.float32)


def diattenuator(x, y):
    """Attenuate the field components at 0/90 deg by x/y
    (`mueller.h:138-149`)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    a = 0.5 * (x + y)
    b = 0.5 * (x - y)
    c = jnp.sqrt(jnp.maximum(x * y, 0.0))
    z = jnp.zeros_like(a)
    return _mm([[a, b, z, z], [b, a, z, z], [z, z, c, z], [z, z, z, c]])


def rotator(theta):
    """Rotate the Stokes reference frame counter-clockwise (sensor view)
    by `theta`; Collett Ch.5 eq. (43) (`mueller.h:164-172`)."""
    s, c = jnp.sin(2.0 * theta), jnp.cos(2.0 * theta)
    o = jnp.ones_like(s)
    z = jnp.zeros_like(s)
    return _mm([[o, z, z, z], [z, c, s, z], [z, -s, c, z], [z, z, z, o]])


def rotated_element(theta, m):
    """Apply a counter-clockwise element rotation: R(theta)^T M R(theta)
    (`mueller.h:179-183`)."""
    r = rotator(theta)
    return matmul(jnp.swapaxes(r, -1, -2), matmul(m, r))


# ---------------------------------------------------------------------------
# Polarized Fresnel (fresnel.h:227 complex form, subsumes the real case)
# ---------------------------------------------------------------------------


# Complex arithmetic on explicit (re, im) float32 pairs: the TPU backend
# has no complex dtype support, so everything below is pair algebra.


def _cmul(a, b):
    return a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0]


def _crcp(a):
    d = jnp.maximum(a[0] * a[0] + a[1] * a[1], 1e-30)
    return a[0] / d, -a[1] / d


def _cdiv(a, b):
    return _cmul(a, _crcp(b))


def _cabs2(a):
    return a[0] * a[0] + a[1] * a[1]


def _csqrt(a):
    """Principal complex square root (re >= 0) on (re, im) pairs."""
    r = jnp.sqrt(jnp.maximum(_cabs2(a), 0.0))
    re = jnp.sqrt(jnp.maximum(0.5 * (r + a[0]), 0.0))
    im_mag = jnp.sqrt(jnp.maximum(0.5 * (r - a[0]), 0.0))
    im = jnp.where(a[1] < 0.0, -im_mag, im_mag)
    return re, im


def fresnel_polarized(cos_theta_i, eta_re, eta_im=0.0):
    """Complex s/p reflection amplitudes at a (possibly conducting)
    interface (`fresnel.h:227-289`), in explicit (re, im) arithmetic.

    The kappa sign is normalised to the physics convention internally,
    like the reference (`fresnel.h:231-234`).
    Returns ((a_s_re, a_s_im), (a_p_re, a_p_im), cos_theta_t,
    eta_it_real, eta_ti_real).
    """
    cos_theta_i = jnp.asarray(cos_theta_i, jnp.float32)
    eta_re = jnp.asarray(eta_re, jnp.float32)
    eta_im = jnp.broadcast_to(jnp.asarray(eta_im, jnp.float32),
                              jnp.broadcast_shapes(
                                  jnp.shape(eta_re),
                                  jnp.shape(jnp.asarray(eta_im))))
    # flip kappa to the (negative) physics convention
    eta = (eta_re, -jnp.abs(eta_im))

    outside = cos_theta_i >= 0.0
    rcp_eta = _crcp(eta)
    eta_it = (jnp.where(outside, eta[0], rcp_eta[0]),
              jnp.where(outside, eta[1], rcp_eta[1]))
    eta_ti = (jnp.where(outside, rcp_eta[0], eta[0]),
              jnp.where(outside, rcp_eta[1], eta[1]))

    sin2 = 1.0 - cos_theta_i ** 2
    ti2 = _cmul(eta_ti, eta_ti)
    cos_theta_t_sqr = (1.0 - sin2 * ti2[0], -sin2 * ti2[1])
    cos_i_abs = jnp.abs(cos_theta_i)
    ct = _csqrt(cos_theta_t_sqr)
    # component-wise sign fix (drjit `mulsign` with cos_theta_t_sqr)
    # selects the physically-correct root under total internal
    # reflection (Clarke, "Stellar Polarimetry" A.2)
    ct = (ct[0] * jnp.where(cos_theta_t_sqr[0] < 0.0, -1.0, 1.0),
          ct[1] * jnp.where(cos_theta_t_sqr[1] < 0.0, -1.0, 1.0))

    it_ct = _cmul(eta_it, ct)
    a_s = _cdiv((cos_i_abs - it_ct[0], -it_ct[1]),
                (cos_i_abs + it_ct[0], it_ct[1]))
    it_ci = (eta_it[0] * cos_i_abs, eta_it[1] * cos_i_abs)
    a_p = _cdiv((it_ci[0] - ct[0], it_ci[1] - ct[1]),
                (it_ci[0] + ct[0], it_ci[1] + ct[1]))

    degenerate = ((eta[0] == 1.0) | (eta[0] == 0.0)) & (eta[1] == 0.0)
    a_s = (jnp.where(degenerate, 0.0, a_s[0]),
           jnp.where(degenerate, 0.0, a_s[1]))
    a_p = (jnp.where(degenerate, 0.0, a_p[0]),
           jnp.where(degenerate, 0.0, a_p[1]))

    # transmitted-direction cosine (0 under TIR), opposite sign to cos_i
    cos_theta_t_signed = jnp.where(
        cos_theta_t_sqr[0] >= 0.0,
        -jnp.abs(ct[0]) * jnp.sign(cos_theta_i), 0.0)
    return a_s, a_p, cos_theta_t_signed, eta_it[0], eta_ti[0]


def _sincos_arg_diff(a_p, a_s):
    """(sin, cos) of the phase delay arg(a_p) - arg(a_s), pair form."""
    z = _cmul(a_p, (a_s[0], -a_s[1]))
    r = jnp.sqrt(jnp.maximum(_cabs2(z), 0.0))
    safe = jnp.maximum(r, 1e-20)
    return z[1] / safe, z[0] / safe


def specular_reflection(cos_theta_i, eta_re, eta_im=0.0):
    """Mueller matrix of specular reflection off a dielectric or conductor
    (`mueller.h:198-223`). `eta` split into (re, im); shapes broadcast and
    the matrix dims are appended."""
    a_s, a_p, _, _, _ = fresnel_polarized(cos_theta_i, eta_re, eta_im)
    sin_d, cos_d = _sincos_arg_diff(a_p, a_s)

    r_s = _cabs2(a_s)
    r_p = _cabs2(a_p)
    a = 0.5 * (r_s + r_p)
    b = 0.5 * (r_s - r_p)
    c = jnp.sqrt(jnp.maximum(r_s * r_p, 0.0))
    sin_d = jnp.where(c == 0.0, 0.0, sin_d)
    cos_d = jnp.where(c == 0.0, 0.0, cos_d)
    z = jnp.zeros_like(a)
    return _mm([[a, b, z, z],
                [b, a, z, z],
                [z, z, c * cos_d, -c * sin_d],
                [z, z, c * sin_d, c * cos_d]])


def specular_transmission(cos_theta_i, eta):
    """Mueller matrix of specular transmission through a dielectric
    (`mueller.h:238-265`). `eta` real (> 0)."""
    a_s, a_p, cos_theta_t, eta_it, eta_ti = fresnel_polarized(
        cos_theta_i, eta)
    # power conversion factor between the media
    factor = -eta_it * jnp.where(jnp.abs(cos_theta_i) > 1e-8,
                                 cos_theta_t / jnp.where(
                                     jnp.abs(cos_theta_i) > 1e-8,
                                     cos_theta_i, 1.0), 0.0)
    a_s_r = 1.0 + a_s[0]
    a_p_r = (1.0 + a_p[0]) * eta_ti
    t_s = a_s_r ** 2
    t_p = a_p_r ** 2
    a = 0.5 * factor * (t_s + t_p)
    b = 0.5 * factor * (t_s - t_p)
    c = factor * jnp.sqrt(jnp.maximum(t_s * t_p, 0.0))
    z = jnp.zeros_like(a)
    return _mm([[a, b, z, z], [b, a, z, z], [z, z, c, z], [z, z, z, c]])


# ---------------------------------------------------------------------------
# Reference-frame rotations
# ---------------------------------------------------------------------------


def stokes_basis(forward):
    """Implicit Stokes reference basis for propagation direction `forward`
    (`mueller.h:285-287`): first tangent of the Duff orthonormal frame."""
    return coordinate_system(forward)[0]


def _unit_angle(u, v):
    """Numerically-stable angle between unit vectors (mitsuba
    `math::unit_angle`): 2 asin(|v - u| / 2)."""
    d = jnp.linalg.norm(v - u, axis=-1)
    from .math import safe_asin
    return 2.0 * safe_asin(0.5 * d)


def rotate_stokes_basis(forward, basis_current, basis_target):
    """Rotator aligning two Stokes bases of collinear beams
    (`mueller.h:315-323`). Returns (..., 4, 4)."""
    bc = basis_current / jnp.maximum(
        jnp.linalg.norm(basis_current, axis=-1, keepdims=True), 1e-20)
    bt = basis_target / jnp.maximum(
        jnp.linalg.norm(basis_target, axis=-1, keepdims=True), 1e-20)
    theta = _unit_angle(bc, bt)
    flip = jnp.sum(forward * jnp.cross(bc, bt), axis=-1) < 0.0
    theta = jnp.where(flip, -theta, theta)
    return rotator(theta)


def rotate_mueller_basis(m, in_forward, in_basis_current, in_basis_target,
                         out_forward, out_basis_current, out_basis_target,
                         chan_axis=True):
    """Re-express M for new input/output Stokes bases
    (`mueller.h:361-371`): R_out @ M @ R_in^T.

    When `chan_axis` is True the (geometry-only) rotators get a singleton
    channel axis inserted so they broadcast against (..., C, 4, 4) M."""
    r_in = rotate_stokes_basis(in_forward, in_basis_current,
                               in_basis_target)
    r_out = rotate_stokes_basis(out_forward, out_basis_current,
                                out_basis_target)
    if chan_axis:
        r_in = r_in[..., None, :, :]
        r_out = r_out[..., None, :, :]
    return matmul(r_out, matmul(m, jnp.swapaxes(r_in, -1, -2)))


def rotate_mueller_basis_collinear(m, forward, basis_current, basis_target,
                                   chan_axis=True):
    """Same-rotation special case (`mueller.h:400-406`): R @ M @ R^T."""
    r = rotate_stokes_basis(forward, basis_current, basis_target)
    if chan_axis:
        r = r[..., None, :, :]
    return matmul(r, matmul(m, jnp.swapaxes(r, -1, -2)))


def to_world_mueller(frame, m_local, in_forward_local, out_forward_local):
    """Convert a Mueller matrix between local-frame implicit bases to
    world-frame implicit bases (`interaction.h:407-428`
    `SurfaceInteraction::to_world_mueller`). `frame` is an
    `ops.math.Frame` over (..., 3) normals; `m_local` is (..., C, 4, 4)."""
    in_fwd_w = frame.to_world(in_forward_local)
    out_fwd_w = frame.to_world(out_forward_local)
    return rotate_mueller_basis(
        m_local,
        in_fwd_w, frame.to_world(stokes_basis(in_forward_local)),
        stokes_basis(in_fwd_w),
        out_fwd_w, frame.to_world(stokes_basis(out_forward_local)),
        stokes_basis(out_fwd_w))
