"""Single-pass direct-illumination megakernel (Pallas TPU).

The wavefront pipeline executes a depth-2 sunsky frame as ~10 XLA
kernels with full lane-state HBM round-trips between them. This kernel
is the TPU analogue of the reference's *megakernel* execution mode
(Dr.Jit records the whole bounce loop into one kernel,
`path.cpp:122-127`): raygen -> intersect -> NEE (TGMM sample + pdf +
radiance) -> shadow test -> diffuse BSDF -> continuation intersect ->
env-hit MIS all run in one VMEM-resident pass; the only HBM traffic is
the per-lane radiance output.

Two radiance cores instead of the wavefront's three: camera rays that
miss and continuation rays share one combined eval+pdf call
(`d_eval = hit ? d_continuation : d_camera`, with MIS weight 1 on the
camera-escape lanes) — structurally fewer transcendentals than the
staged pipeline, not just fewer memory trips.

Scope (statically checked by `integrator._megakernel_ok`): RGB mode,
max_depth == 2, sunsky environment (any env_to_world rotation), analytic
sphere/rectangle/disk shapes only, one-sided or twosided diffuse BSDFs,
perspective sensor, box filter, `independent` sampler, power-of-two
film width and spp, no meshes/media/textures/area/delta lights. The
estimator (RNG stream ids, MIS weights, shadow offsets, clamps) mirrors
`integrator._path_sample` exactly; results agree with the wavefront
path statistically (same estimator, different transcendental
polynomials — see tests/test_megakernel.py).

AD: exposed behind a `custom_jvp` whose tangent rule re-traces the pure
jnp wavefront path, so `jax.grad`/`jvp` through `render()` never
touches the kernel (same pattern as the other sunsky kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from . import trig
from .sunsky_kernel import (_CONST_SPECS, _GAUSS_SPEC, _gauss_rows,
                            _misc_row, _nee_sample_rows, _pdf_row,
                            _radiance_rows)

BLOCK = int(os.environ.get("TPUSKY_MEGABLOCK", "8192"))

_RAY_EPS = 1e-4
_SHADOW_EPS = 1e-3

# camera/constants row layout (1, 32) f32
_C_R0 = 0          # 0..8   camera rotation (row-major, d_world = R d_cam)
_C_OX, _C_OY, _C_OZ = 9, 10, 11
_C_TANH, _C_ASPECT = 12, 13
_C_E0 = 14         # 14..22 env world->local rotation (row-major)
# 23.. unused


def _rand(lane, dim: int, c: int, seed):
    """Exact mirror of sampler.lane_samples(kind='independent')."""
    def h(x):
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x7FEB352D)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(0x846CA68B)
        x = x ^ (x >> 16)
        return x
    dc = jnp.uint32(dim * 64 + c)
    x = h(lane * jnp.uint32(0x85EBCA6B) + dc * jnp.uint32(0xC2B2AE35)
          + seed)
    x = h(x ^ (lane + jnp.uint32(0x9E3779B9)))
    x = h(x + dc)
    # Mosaic has no u32->f32 cast; (x >> 8) < 2^24 fits int32 exactly
    return (x >> 8).astype(jnp.int32).astype(jnp.float32) \
        * (1.0 / (1 << 24))


def _isect_shape(kind: int, srow, ox, oy, oz, dx, dy, dz):
    """One analytic shape (static kind). srow = (32,) object-transform
    row. Returns (t, nwx, nwy, nwz) with t = +inf on miss; normals
    unnormalised (caller normalises the winning hit)."""
    a00, a01, a02 = srow[0], srow[1], srow[2]
    a10, a11, a12 = srow[3], srow[4], srow[5]
    a20, a21, a22 = srow[6], srow[7], srow[8]
    bx, by, bz = srow[9], srow[10], srow[11]
    olx = a00 * ox + a01 * oy + a02 * oz + bx
    oly = a10 * ox + a11 * oy + a12 * oz + by
    olz = a20 * ox + a21 * oy + a22 * oz + bz
    dlx = a00 * dx + a01 * dy + a02 * dz
    dly = a10 * dx + a11 * dy + a12 * dz
    dlz = a20 * dx + a21 * dy + a22 * dz
    inf = jnp.float32(jnp.inf)
    if kind == 0:                                    # sphere
        a = dlx * dlx + dly * dly + dlz * dlz
        b = 2.0 * (olx * dlx + oly * dly + olz * dlz)
        c = olx * olx + oly * oly + olz * olz - 1.0
        disc = b * b - 4.0 * a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        q = -0.5 * (b + jnp.sign(b) * sq)
        t0 = q / a
        t1 = c / jnp.where(q == 0.0, 1.0, q)
        tn = jnp.minimum(t0, t1)
        tf = jnp.maximum(t0, t1)
        t = jnp.where(tn > _RAY_EPS, tn, jnp.where(tf > _RAY_EPS, tf, inf))
        t = jnp.where(disc >= 0.0, t, inf)
        tc = jnp.where(t < inf, t, 0.0)
        nlx = olx + tc * dlx
        nly = oly + tc * dly
        nlz = olz + tc * dlz
    else:                                            # rectangle / disk
        t_pl = -olz / jnp.where(dlz == 0.0, 1.0, dlz)
        px = olx + t_pl * dlx
        py = oly + t_pl * dly
        if kind == 2:
            inside = px * px + py * py <= 1.0
        else:
            inside = (jnp.abs(px) <= 1.0) & (jnp.abs(py) <= 1.0)
        ok = (dlz != 0.0) & (t_pl > _RAY_EPS) & inside
        t = jnp.where(ok, t_pl, inf)
        nlx = jnp.zeros_like(t)
        nly = jnp.zeros_like(t)
        nlz = jnp.ones_like(t)
    # world normal = (to_object linear)^T @ n_local
    nwx = a00 * nlx + a10 * nly + a20 * nlz
    nwy = a01 * nlx + a11 * nly + a21 * nlz
    nwz = a02 * nlx + a12 * nly + a22 * nlz
    return t, nwx, nwy, nwz


def _intersect_all(kinds, shp_ref, alb_ref, ox, oy, oz, dx, dy, dz):
    """Closest hit over the static shape list, with the winning shape's
    material row selected in the same pass. Returns
    (hit, t, n̂ rows, albedo rows, twosided row)."""
    inf = jnp.float32(jnp.inf)
    best_t = jnp.full_like(dx, inf)
    bnx = jnp.zeros_like(dx)
    bny = jnp.zeros_like(dx)
    bnz = jnp.ones_like(dx)
    ar = jnp.zeros_like(dx)
    ag = jnp.zeros_like(dx)
    ab = jnp.zeros_like(dx)
    tws = jnp.zeros_like(dx)
    for s, kind in enumerate(kinds):
        t, nx, ny, nz = _isect_shape(kind, shp_ref[s], ox, oy, oz,
                                     dx, dy, dz)
        closer = t < best_t
        best_t = jnp.where(closer, t, best_t)
        bnx = jnp.where(closer, nx, bnx)
        bny = jnp.where(closer, ny, bny)
        bnz = jnp.where(closer, nz, bnz)
        ar = jnp.where(closer, alb_ref[s, 0], ar)
        ag = jnp.where(closer, alb_ref[s, 1], ag)
        ab = jnp.where(closer, alb_ref[s, 2], ab)
        tws = jnp.where(closer, alb_ref[s, 3], tws)
    hit = best_t < inf
    inv = 1.0 / jnp.sqrt(jnp.maximum(bnx * bnx + bny * bny + bnz * bnz,
                                     1e-24))
    return (hit, best_t, bnx * inv, bny * inv, bnz * inv,
            ar, ag, ab, tws)


def _occluded(kinds, shp_ref, ox, oy, oz, dx, dy, dz):
    occ = jnp.zeros_like(dx, dtype=bool)
    for s, kind in enumerate(kinds):
        t, _, _, _ = _isect_shape(kind, shp_ref[s], ox, oy, oz, dx, dy, dz)
        occ = occ | (t < jnp.float32(jnp.inf))
    return occ


def _mis(pa, pb):
    a2 = pa * pa
    b2 = pb * pb
    w = a2 / (a2 + b2)
    return jnp.where((a2 + b2) > 0.0, w, 0.0)


def _mega_kernel(kinds, spp: int, width: int, height: int,
                 sample_major: bool,
                 cam_ref, shp_ref, alb_ref, seed_ref,
                 skyp_ref, skyr_ref, sun_ref, misc_ref, g_ref, out_ref):
    # Roofline instrumentation (tools/mega_roofline.py): stages named in
    # TPUSKY_MEGA_STUB (comma list, read at TRACE time) are replaced by
    # shape-compatible constants, so per-stage cost = full - stubbed.
    stub = frozenset(
        x for x in os.environ.get("TPUSKY_MEGA_STUB", "").split(",") if x)
    pid = pl.program_id(0)
    seed = seed_ref[0, 0].astype(jnp.uint32)
    lane = (jnp.uint32(pid * BLOCK)
            + jax.lax.broadcasted_iota(jnp.uint32, (1, BLOCK), 1))
    spp_sh = spp.bit_length() - 1
    if sample_major:
        # lane = sample*H*W + pixel (H*W pow2, checked by the wrapper):
        # the per-pixel spp reduction outside becomes spp CONTIGUOUS
        # chunk adds instead of an 8-strided window. RNG stays keyed on
        # pixel*spp + sample, so every sample is bitwise the one the
        # pixel-major layout would draw.
        hw_sh = (width * height).bit_length() - 1
        pixel = lane & jnp.uint32(width * height - 1)
        smp_i = lane >> hw_sh
        lane = (pixel << spp_sh) + smp_i
    else:
        pixel = lane >> spp_sh
    if width & (width - 1) == 0:
        w_sh = width.bit_length() - 1
        px = (pixel & jnp.uint32(width - 1)).astype(jnp.int32) \
            .astype(jnp.float32)
        py = (pixel >> w_sh).astype(jnp.int32).astype(jnp.float32)
    else:
        # non-pow2 width: exact f32 div-mod (pixel < 2^24, guaranteed by
        # _megakernel_ok's w*h bound; the rounding of the reciprocal
        # multiply is corrected by the two where-steps)
        pf = pixel.astype(jnp.int32).astype(jnp.float32)
        py = jnp.floor(pf * (1.0 / width))
        px = pf - py * width
        py = jnp.where(px < 0.0, py - 1.0, py)
        px = jnp.where(px < 0.0, px + width, px)
        py = jnp.where(px >= width, py + 1.0, py)
        px = jnp.where(px >= width, px - width, px)

    # ---- camera ray (perspective_ray + _render_rows_chunk raygen) ----
    if "rand" in stub:
        def _rand_s(lane_, dim, c, seed_):
            # Mosaic has no uint32->f32 cast; go through the int32 path
            return 0.5 + 0.0 * (lane_ >> 8).astype(jnp.int32) \
                .astype(jnp.float32)
    else:
        _rand_s = _rand
    u0 = _rand_s(lane, 10_000, 0, seed)
    u1 = _rand_s(lane, 10_000, 1, seed)
    uvx = (px + u0) * (1.0 / width)
    uvy = (py + u1) * (1.0 / height)
    tanh = cam_ref[0, _C_TANH]
    x_c = (2.0 * uvx - 1.0) * tanh
    y_c = (1.0 - 2.0 * uvy) * tanh / cam_ref[0, _C_ASPECT]
    dx = cam_ref[0, _C_R0 + 0] * x_c + cam_ref[0, _C_R0 + 1] * y_c \
        + cam_ref[0, _C_R0 + 2]
    dy = cam_ref[0, _C_R0 + 3] * x_c + cam_ref[0, _C_R0 + 4] * y_c \
        + cam_ref[0, _C_R0 + 5]
    dz = cam_ref[0, _C_R0 + 6] * x_c + cam_ref[0, _C_R0 + 7] * y_c \
        + cam_ref[0, _C_R0 + 8]
    inv = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz)
    dx, dy, dz = dx * inv, dy * inv, dz * inv
    ox = jnp.broadcast_to(cam_ref[0, _C_OX], dx.shape)
    oy = jnp.broadcast_to(cam_ref[0, _C_OY], dx.shape)
    oz = jnp.broadcast_to(cam_ref[0, _C_OZ], dx.shape)

    # The whole frame runs in ENV-LOCAL coordinates: the wrapper rotates
    # the camera and every shape transform by env_to_world^T once on the
    # host, so the two per-lane frame changes the round-4 roofline
    # flagged (~36 VPU ops/lane of a ~230-op budget) vanish — sampled
    # env directions feed the BSDF/shadow math directly, and env-hit
    # lookups need no world->local rotation. Radiance is
    # rotation-invariant, so the film output is unchanged.

    # ---- bounce 0: intersect + material select (one pass) ----
    if "isect" in stub:
        one = jnp.ones_like(dx)
        hit = dz < 0.0
        t = one
        nx, ny = one * 0.0, one * 0.0
        nz = one
        ar, ag, ab = one * 0.4, one * 0.4, one * 0.4
        tws = one * 0.0
    else:
        hit, t, nx, ny, nz, ar, ag, ab, tws = _intersect_all(
            kinds, shp_ref, alb_ref, ox, oy, oz, dx, dy, dz)
    tfin = jnp.where(hit, t, 0.0)
    pxw = ox + tfin * dx
    pyw = oy + tfin * dy
    pzw = oz + tfin * dz

    # shading frame (Duff branchless basis around n̂); twosided diffuse
    # flips the frame toward the incident side (`twosided.cpp`)
    cos_i = -(dx * nx + dy * ny + dz * nz)      # wi.z in the geo frame
    flip = (tws > 0.5) & (cos_i < 0.0)
    fsg = jnp.where(flip, -1.0, 1.0)
    fnx, fny, fnz = nx * fsg, ny * fsg, nz * fsg
    sign = jnp.where(fnz >= 0.0, 1.0, -1.0)
    a_b = -1.0 / (sign + fnz)
    b_b = fnx * fny * a_b
    sxx = fnx * fnx * a_b * sign + 1.0
    sxy = b_b * sign
    sxz = -fnx * sign
    txx = b_b
    txy = fny * fny * a_b + sign
    txz = -fny

    wi_z = cos_i * fsg

    # ---- NEE (sunsky sample + pdf + radiance, env frame) ----
    # NOTE: batching this pdf/radiance with the env-hit lookup in one
    # wide (1, 2B) pass was tried and REVERTED: Mosaic cannot concat
    # lane vectors with mismatched sublane offsets ("result/input offset
    # mismatch on non-concat dimension", 2026-08).
    un0 = _rand_s(lane, 0, 0, seed)
    un1 = _rand_s(lane, 0, 1, seed)
    if "nee" in stub:
        # cheap lane-varying stand-in (all-constant rows trip a Mosaic
        # compiler check, "limits[i] <= dim(i)")
        edx = 0.25 + 0.1 * un0
        edy = 0.15 + 0.1 * un1
        edz = jnp.sqrt(jnp.maximum(1.0 - edx * edx - edy * edy, 0.0))
        pick_sky = un0 < 0.8
    else:
        edx, edy, edz, pick_sky = _nee_sample_rows(un0, un1, misc_ref,
                                                   g_ref)
    if "pdf" in stub:
        pdf_e = 0.5 + 0.0 * un0
    else:
        pdf_e = _pdf_row(edx, edy, edz, g_ref, misc_ref, pick_sky)
    pdf_e = jnp.where(edz >= 0.0, pdf_e, 0.0)
    if "rad" in stub:
        Lr = Lg = Lb = 1.0 + 0.0 * un0
    else:
        Lr, Lg, Lb = _radiance_rows(edx, edy, edz, skyp_ref, skyr_ref,
                                    sun_ref, misc_ref)
    wdx, wdy, wdz = edx, edy, edz
    # diffuse eval toward d_e: f = albedo/pi * cos_o, valid if both sides
    cos_o = wdx * fnx + wdy * fny + wdz * fnz
    valid_nee = (wi_z > 0.0) & (cos_o > 0.0)
    pdf_b_nee = jnp.where(valid_nee, cos_o * (1.0 / jnp.pi), 0.0)
    # shadow ray
    ndote = wdx * nx + wdy * ny + wdz * nz
    plen = jnp.sqrt(pxw * pxw + pyw * pyw + pzw * pzw)
    eps_l = _SHADOW_EPS * jnp.maximum(1.0, plen)
    osx = pxw + jnp.sign(ndote) * nx * eps_l
    osy = pyw + jnp.sign(ndote) * ny * eps_l
    osz = pzw + jnp.sign(ndote) * nz * eps_l
    if "occ" in stub:
        occ = osx > 1e30
    else:
        occ = _occluded(kinds, shp_ref, osx, osy, osz, wdx, wdy, wdz)

    # ---- BSDF cosine sample -> continuation direction ----
    ub0 = _rand_s(lane, 1, 0, seed)
    ub1 = _rand_s(lane, 1, 1, seed)
    # concentric disk (square_to_uniform_disk_concentric)
    cx = 2.0 * ub0 - 1.0
    cy = 2.0 * ub1 - 1.0
    is_zero = (cx == 0.0) & (cy == 0.0)
    q13 = jnp.abs(cx) < jnp.abs(cy)
    r_c = jnp.where(q13, cy, cx)
    rp = jnp.where(q13, cx, cy)
    phi_c = 0.25 * jnp.pi * rp / jnp.where(is_zero, 1.0, r_c)
    phi_c = jnp.where(q13, 0.5 * jnp.pi - phi_c, phi_c)
    phi_c = jnp.where(is_zero, 0.0, phi_c)
    lx = r_c * jnp.cos(phi_c)
    ly = r_c * jnp.sin(phi_c)
    lz = jnp.sqrt(jnp.maximum(1.0 - lx * lx - ly * ly, 0.0))
    pdf_next = jnp.where(hit & (wi_z > 0.0), lz * (1.0 / jnp.pi), 0.0)
    cdx = lx * sxx + ly * txx + lz * fnx
    cdy = lx * sxy + ly * txy + lz * fny
    cdz = lx * sxz + ly * txz + lz * fnz
    ndc = cdx * nx + cdy * ny + cdz * nz
    o2x = pxw + jnp.sign(ndc) * nx * eps_l
    o2y = pyw + jnp.sign(ndc) * ny * eps_l
    o2z = pzw + jnp.sign(ndc) * nz * eps_l
    cont = hit & (pdf_next > 0.0)

    # ---- combined env lookup: continuation rays (MIS) + camera-escape
    # rays (weight 1); one radiance+pdf core for both ----
    gdx = jnp.where(cont, cdx, dx)
    gdy = jnp.where(cont, cdy, dy)
    gdz = jnp.where(cont, cdz, dz)
    if "occ" in stub:
        occ2 = o2x > 1e30
    else:
        occ2 = _occluded(kinds, shp_ref, o2x, o2y, o2z, cdx, cdy, cdz)
    ex, ey, ez = gdx, gdy, gdz
    if "rad" in stub:
        Er = Eg = Eb = 1.0 + 0.0 * ex
    else:
        Er, Eg, Eb = _radiance_rows(ex, ey, ez, skyp_ref, skyr_ref,
                                    sun_ref, misc_ref)
    if "pdf" in stub:
        em_pdf = 0.5 + 0.0 * ex
    else:
        em_pdf = _pdf_row(ex, ey, ez, g_ref, misc_ref,
                          jnp.ones_like(ex, dtype=bool))

    # ---- NEE contribution ----
    mis_nee = _mis(pdf_e, pdf_b_nee)
    wgt_nee = mis_nee / jnp.maximum(pdf_e, 1e-20)
    ok_nee = hit & ~occ & (pdf_e > 0.0) & valid_nee
    scale_nee = jnp.where(ok_nee, wgt_nee * cos_o * (1.0 / jnp.pi), 0.0)
    res_r = scale_nee * ar * Lr
    res_g = scale_nee * ag * Lg
    res_b = scale_nee * ab * Lb

    mis_em = _mis(pdf_next, em_pdf)
    esc_cam = ~hit                              # camera ray escaped: w=1
    esc_cont = cont & ~occ2                     # continuation escaped
    w_env = jnp.where(esc_cam, 1.0, jnp.where(esc_cont, mis_em, 0.0))
    thr_r = jnp.where(esc_cam, 1.0, ar)         # cosine-sample weight =
    thr_g = jnp.where(esc_cam, 1.0, ag)         # albedo (diffuse)
    thr_b = jnp.where(esc_cam, 1.0, ab)
    res_r = res_r + w_env * thr_r * Er
    res_g = res_g + w_env * thr_g * Eg
    res_b = res_b + w_env * thr_b * Eb

    out_ref[0:1, :] = jnp.where(jnp.isfinite(res_r), res_r, 0.0)
    out_ref[1:2, :] = jnp.where(jnp.isfinite(res_g), res_g, 0.0)
    out_ref[2:3, :] = jnp.where(jnp.isfinite(res_b), res_b, 0.0)


def _shape_rows(shapes, env_rot=None):
    """(n_shapes, 32) object-transform rows from a ShapeTable; env_rot
    composes the env-frame world rotation into the linear part
    (local = A (E w') + b with w' the env-local point)."""
    t2o = shapes.to_object
    n = t2o.shape[0]
    lin = t2o[:, :3, :3]
    if env_rot is not None:
        lin = jnp.einsum("nij,jk->nik", lin, env_rot,
                         precision=jax.lax.Precision.HIGHEST)
    rows = jnp.zeros((n, 32), jnp.float32)
    rows = rows.at[:, 0:9].set(lin.reshape(n, 9))
    rows = rows.at[:, 9:12].set(t2o[:, :3, 3])
    return rows


@functools.partial(jax.jit, static_argnames=("spp", "width", "height",
                                             "interpret", "lane_major",
                                             "sample_major"))
def direct_rgb_megakernel(scene, sensor, state, seed_key, spp: int,
                          width: int, height: int,
                          interpret: bool = False,
                          lane_major: bool = False,
                          sample_major: bool = False):
    """Fused direct-illumination frame -> per-lane radiance, pixel-ordered
    (N = width*height*spp): (N, 3), or the kernel's native (3, N) rows
    when lane_major=True — consuming the rows directly avoids an HBM
    relayout of the (N, 3) intermediate (minor-dim-3 arrays tile to 128
    lanes on TPU; the transpose cost ~1.5 ms/frame at 512²@8spp, the
    round-4 "12% harness overhead"). See module docstring for the static
    eligibility contract."""
    kinds = scene.shapes.kind
    n = width * height * spp
    n_pad = -(-n // BLOCK) * BLOCK
    if sample_major:
        assert (width * height) & (width * height - 1) == 0, \
            "sample_major needs a power-of-two pixel count"
        assert lane_major, "sample_major output is lane-major rows"

    # rotate the world into the env-local frame (world' = E^T world):
    # camera rotation/origin and shape to_object linear parts absorb the
    # rotation once here; the kernel then never touches env_to_world
    # (E == I leaves every matrix bitwise unchanged: x*1 + y*0 is exact)
    E = scene.env_to_world
    r = E.T @ sensor.to_world[:3, :3]
    cam = jnp.zeros((1, 32), jnp.float32)
    cam = cam.at[0, 0:9].set(r.reshape(-1))
    cam = cam.at[0, 9:12].set(E.T @ sensor.to_world[:3, 3])
    cam = cam.at[0, _C_TANH].set(
        jnp.tan(0.5 * jnp.deg2rad(sensor.fov_x_deg)))
    cam = cam.at[0, _C_ASPECT].set(sensor.aspect)

    alb = jnp.take(scene.bsdfs.albedo, scene.shapes.bsdf_idx, axis=0)
    tws = jnp.take(scene.bsdfs.twosided.astype(jnp.float32),
                   scene.shapes.bsdf_idx)
    alb4 = jnp.concatenate([alb, tws[:, None]], axis=-1)
    alb_rows = jnp.zeros((len(kinds), 32), jnp.float32)
    alb_rows = alb_rows.at[:, :4].set(alb4)

    seed = jax.random.key_data(seed_key)[-1].astype(jnp.int32)[None, None]

    n_sh = len(kinds)
    kernel = functools.partial(_mega_kernel, kinds, spp, width, height,
                               sample_major)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // BLOCK,),
        in_specs=[
            pl.BlockSpec((1, 32), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sh, 32), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sh, 32), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ] + _CONST_SPECS + [_GAUSS_SPEC],
        out_specs=pl.BlockSpec((3, BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
        interpret=interpret,
    )(cam, _shape_rows(scene.shapes, E), alb_rows, seed,
      state.sky_params, state.sky_radiance[None, :], state.sun_radiance.T,
      _misc_row(state), _gauss_rows(state))
    if lane_major:
        return out[:, :n]
    return out[:, :n].T
