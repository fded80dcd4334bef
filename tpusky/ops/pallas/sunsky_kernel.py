"""Fused Pallas TPU kernel for sunsky RGB radiance evaluation.

One pass over the ray wavefront computes the full Hosek-Wilkie sky
radiance and limb-darkened sun disc per ray (the hot `eval` of
BASELINE.json's north star): every coefficient table lives in VMEM, the
45-segment sun coefficient lookup is an in-kernel MXU one-hot matmul, and
all transcendentals run on the VPU — no HBM round-trips between the
stages that XLA would otherwise materialise.

Layout: directions and radiance are lane-major (3, N) / (N padded to the
128-lane tile), processed in B-lane blocks over a 1D grid.

Falls back to the pure-jnp `model.eval` on non-TPU backends (the kernel
also runs under `interpret=True` for CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.sunsky import constants as C

BLOCK = 2048

_N_SEG = C.N_SUN_SEGMENTS          # 45
_SUN_F = 3 * 4 * 6                 # 72 flattened rgb sun coefs per segment


def _asin01(t):
    """asin for t in [0, 1] via Abramowitz & Stegun 4.4.46 (|err| <= 2e-8,
    f32-grade). Mosaic TPU has no asin/acos/atan2 primitives."""
    p = (1.5707963050 + t * (-0.2145988016 + t * (0.0889789874 + t * (
        -0.0501743046 + t * (0.0308918810 + t * (-0.0170881256 + t * (
            0.0066700901 + t * -0.0012624911)))))))
    return 0.5 * jnp.pi - jnp.sqrt(jnp.maximum(1.0 - t, 0.0)) * p


def _sunsky_rgb_kernel(d_ref, skyp_ref, skyr_ref, sun_ref, misc_ref,
                       out_ref):
    """d (3, B) -> radiance (3, B).

    skyp (3, 9) sky coefficients; skyr (1, 3) mean radiance;
    sun (72, 45) transposed flattened sun table; misc (1, 8):
    [sun_nx, sun_ny, sun_nz, half_aperture, sky_scale, sun_scale,
     area_ratio_conv, unused].
    """
    dx = d_ref[0:1, :]
    dy = d_ref[1:2, :]
    dz = d_ref[2:3, :]

    sun_nx = misc_ref[0, 0]
    sun_ny = misc_ref[0, 1]
    sun_nz = misc_ref[0, 2]
    half_ap = misc_ref[0, 3]
    sky_scale = misc_ref[0, 4]
    sun_scale_conv = misc_ref[0, 5]  # sun_scale * area_ratio * RGB conv

    cos_theta = dz
    below = cos_theta < 0.0
    cos_theta_c = jnp.maximum(cos_theta, 0.0)

    # gamma via the stable unit-angle form (matches ops/math.py unit_angle)
    dot_sd = dx * sun_nx + dy * sun_ny + dz * sun_nz
    sx = jnp.where(dot_sd >= 0.0, sun_nx, -sun_nx)
    sy = jnp.where(dot_sd >= 0.0, sun_ny, -sun_ny)
    sz = jnp.where(dot_sd >= 0.0, sun_nz, -sun_nz)
    diff2 = (dx - sx) ** 2 + (dy - sy) ** 2 + (dz - sz) ** 2
    half_chord = jnp.clip(0.5 * jnp.sqrt(diff2), 0.0, 1.0)
    temp = 2.0 * _asin01(half_chord)
    gamma = jnp.where(dot_sd >= 0.0, temp, jnp.pi - temp)

    cos_gamma = jnp.cos(gamma)
    cos_gamma_sqr = cos_gamma * cos_gamma

    # ---- sun segment + powers ----
    # elevation = pi/2 - acos(c) = asin(c), c >= 0 here
    elevation = _asin01(jnp.clip(cos_theta_c, 0.0, 1.0))
    # cbrt(x) = exp(log(x)/3) for x > 0 (no cbrt primitive in Mosaic);
    # elevation >= 0 here, guard the log at 0
    rel_el = jnp.maximum(2.0 * elevation / jnp.pi, 1e-30)
    pos_f = jnp.exp(jnp.log(rel_el) * (1.0 / 3.0)) * _N_SEG
    pos = jnp.clip(pos_f.astype(jnp.int32), 0, _N_SEG - 1)
    break_x = 0.5 * jnp.pi * (pos.astype(jnp.float32) / _N_SEG) ** 3
    x = jnp.maximum(elevation - break_x, 0.0)

    sin_ap = jnp.sin(half_ap)
    sin_g = jnp.sin(gamma)
    cp2 = 1.0 - (sin_g * sin_g) / (sin_ap * sin_ap)
    cos_psi = jnp.where(cp2 > 0.0, jnp.sqrt(jnp.maximum(cp2, 0.0)), 0.0)
    # everything below stays rank-2 (1, B)

    # one-hot (45, B) @ via dot_general: coefs (72, B) = sun (72, 45) x oh
    seg_ids = jax.lax.broadcasted_iota(jnp.int32, (_N_SEG, BLOCK), 0)
    onehot = (seg_ids == pos[0:1, :]).astype(jnp.float32)  # (45, B)
    coefs = jax.lax.dot_general(sun_ref[:, :], onehot,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)

    # powers of x (4) and cos_psi (6) via iterated products, all (1, B)
    xp = [jnp.ones_like(x), x, x * x, x * x * x]
    cp = [jnp.ones_like(cos_psi)]
    for _ in range(5):
        cp.append(cp[-1] * cos_psi)

    hit_sun = cos_gamma >= jnp.cos(half_ap)

    out_rows = []
    for c in range(3):
        # ---- sky formula for channel c ----
        a = skyp_ref[c, 0]
        b = skyp_ref[c, 1]
        cc = skyp_ref[c, 2]
        dd = skyp_ref[c, 3]
        e = skyp_ref[c, 4]
        f = skyp_ref[c, 5]
        g = skyp_ref[c, 6]
        i = skyp_ref[c, 7]
        h = skyp_ref[c, 8]
        c1 = 1.0 + a * jnp.exp(b / (cos_theta_c + 0.01))
        base = 1.0 + h * h - 2.0 * h * cos_gamma
        chi = (1.0 + cos_gamma_sqr) / (base * jnp.sqrt(
            jnp.maximum(base, 1e-12)))
        c2 = (cc + dd * jnp.exp(e * gamma) + f * cos_gamma_sqr
              + g * chi + i * jnp.sqrt(cos_theta_c))
        sky = c1 * c2 * skyr_ref[0, c]

        # ---- sun polynomial for channel c ----
        sun = jnp.zeros_like(sky)
        for k in range(4):
            for j in range(6):
                row = c * 24 + k * 6 + j
                sun = sun + coefs[row:row + 1, :] * xp[k] * cp[j]
        sun = jnp.where(hit_sun, sun, 0.0)

        val = (sky_scale * sky + sun_scale_conv * sun) * C.CIE_Y_NORMALIZATION
        out_rows.append(jnp.where(below, 0.0, val))

    out_ref[0:1, :] = out_rows[0]
    out_ref[1:2, :] = out_rows[1]
    out_ref[2:3, :] = out_rows[2]


@functools.partial(jax.jit, static_argnames=("interpret",))
def sunsky_eval_rgb_pallas(state, d, interpret: bool = False):
    """Fused RGB sunsky radiance. d (N, 3) local directions -> (N, 3).

    Numerically matches `model.eval(state, d, mode='rgb')` to f32
    round-off; see tests/test_pallas.py.
    """
    from ...models.sunsky.model import area_ratio

    n = d.shape[0]
    n_pad = -(-n // BLOCK) * BLOCK
    d_t = jnp.zeros((3, n_pad), jnp.float32)
    d_t = d_t.at[:, :n].set(d.T)

    p = state.params
    misc = jnp.stack([
        state.sun_frame_n[0], state.sun_frame_n[1], state.sun_frame_n[2],
        p.sun_half_aperture, p.sky_scale,
        p.sun_scale * area_ratio(p.sun_half_aperture)
        * jnp.float32(C.SPEC_TO_RGB_SUN_CONV),
        jnp.float32(0.0), jnp.float32(0.0)])[None, :]

    sun_t = state.sun_radiance.T                      # (72, 45)
    skyr = state.sky_radiance[None, :]                # (1, 3)

    out = pl.pallas_call(
        _sunsky_rgb_kernel,
        grid=(n_pad // BLOCK,),
        in_specs=[
            pl.BlockSpec((3, BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 9), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUN_F, _N_SEG), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
        interpret=interpret,
    )(d_t, state.sky_params, skyr, sun_t, misc)
    return out[:, :n].T
