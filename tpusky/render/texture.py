"""Spatially-varying textures: checkerboard + bitmap (packed atlas).

TPU-first counterpart of the reference's texture plugins (SURVEY.md L3;
`src/textures/checkerboard.cpp`, `src/textures/bitmap.cpp`):

* All textures in a scene live in ONE `TextureTable`: per-texture scalar
  parameters in small SoA arrays (fetched with one-hot matmuls, see
  ops/gather.py) and all bitmap texels packed into ONE flat `(A, 4)` atlas
  so a bilinear lookup is a single dynamic gather per tap regardless of
  how many textures the scene has.
* Checkerboard is pure VPU math (`frac(uv) > 0.5` per axis, equal ->
  color0 else color1 — the reference's `checkerboard.cpp:74-86` rule,
  defaults 0.4/0.2).
* Spectral mode: checker colours carry 11-point spectra on the sunsky
  wavelength grid; bitmap texels carry per-texel sigmoid-polynomial
  coefficients (Jakob & Hanika 2019) fitted once at load time
  (`ops/rgb2spec.py`) and evaluated in-kernel at the path's hero
  wavelengths — the reference's rgb2spec path (`srgb.cpp:14`) without the
  64^3 lookup table.

Wrap modes follow the reference's bitmap plugin: repeat / mirror / clamp.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gather import take_ints, take_rows, take_scalars

CHECKERBOARD, BITMAP = 0, 1
VOLUME, MESH_ATTR = 2, 3
WRAP_REPEAT, WRAP_MIRROR, WRAP_CLAMP = 0, 1, 2

_LAM_MIN, _LAM_MAX = 360.0, 830.0   # sigmoid-coefficient wavelength frame


class TextureTable(NamedTuple):
    """SoA texture set; static length T = number of textures in the scene."""
    kind: jnp.ndarray          # (T,) int32
    color0: jnp.ndarray        # (T, 3) checker colour (RGB)
    color1: jnp.ndarray        # (T, 3)
    color0_spec: jnp.ndarray   # (T, 11) checker colour at 320..720nm
    color1_spec: jnp.ndarray   # (T, 11)
    uv_transform: jnp.ndarray  # (T, 3, 3) affine `to_uv`
    wrap: jnp.ndarray          # (T,) int32 wrap mode
    offset: jnp.ndarray        # (T,) int32 first texel in the atlas
    width: jnp.ndarray         # (T,) int32
    height: jnp.ndarray        # (T,) int32
    atlas: jnp.ndarray         # (A, 4) packed texel RGB + spare channel
    atlas_coeff: jnp.ndarray   # (A, 4) sigmoid c0..c2 + scale (spectral)
    depth: jnp.ndarray = None  # (T,) int32 volume z-extent (1 otherwise)
    world_to_tex: jnp.ndarray = None  # (T, 4, 4) world -> [0,1]^3 for
    #                                    volume textures (`volume.cpp`)
    attr_scale: jnp.ndarray = None    # (T,) mesh_attribute scale


def make_texture_table(textures, spectral: bool = False) -> TextureTable:
    """Build a TextureTable from host-side descriptions.

    textures: list of dicts, either
      {kind: 'checkerboard', color0, color1, to_uv (3x3)?}
      {kind: 'bitmap', data (H, W, 3) float, to_uv?, wrap: 'repeat'|...}
      {kind: 'volume', grid (D, H, W[, 3]) float, to_world (4, 4)?} —
        a 3D texture evaluated at the world hit position, the reference's
        `volume.cpp` texture wrapping a gridvolume
      {kind: 'mesh_attribute', scale?} — per-vertex data interpolated at
        the hit (`mesh_attribute.cpp`, name fixed to "vertex_color")
    `spectral=True` additionally fits per-texel sigmoid spectra (slower
    load; only needed for spectral renders).
    """
    t = len(textures)
    kind = np.zeros((t,), np.int32)
    c0 = np.full((t, 3), 0.4, np.float32)
    c1 = np.full((t, 3), 0.2, np.float32)
    c0s = np.full((t, 11), 0.4, np.float32)
    c1s = np.full((t, 11), 0.2, np.float32)
    uvt = np.tile(np.eye(3, dtype=np.float32), (t, 1, 1))
    wrap = np.zeros((t,), np.int32)
    offset = np.zeros((t,), np.int32)
    width = np.ones((t,), np.int32)
    height = np.ones((t,), np.int32)
    depth = np.ones((t,), np.int32)
    w2t = np.tile(np.eye(4, dtype=np.float32), (t, 1, 1))
    attr_scale = np.ones((t,), np.float32)
    blobs = []
    n_texels = 0
    wrap_map = {"repeat": WRAP_REPEAT, "mirror": WRAP_MIRROR,
                "clamp": WRAP_CLAMP}

    from ..ops.rgb2spec import fit_sigmoid_coeffs, upsample_rgb

    for i, d in enumerate(textures):
        if d.get("to_uv") is not None:
            uvt[i] = np.asarray(d["to_uv"], np.float32).reshape(3, 3)
        if d["kind"] == "mesh_attribute":
            kind[i] = MESH_ATTR
            attr_scale[i] = float(d.get("scale", 1.0))
        elif d["kind"] == "volume":
            kind[i] = VOLUME
            grid = np.asarray(d["grid"], np.float32)
            if grid.ndim == 3:
                grid = grid[..., None]
            if grid.shape[-1] == 1:
                grid = np.repeat(grid, 3, axis=-1)
            dz, h, w = grid.shape[:3]
            t2w = np.asarray(d.get("to_world", np.eye(4)), np.float32)
            w2t[i] = np.linalg.inv(t2w)
            offset[i] = n_texels
            width[i] = w
            height[i] = h
            depth[i] = dz
            flat = grid.reshape(-1, 3)
            texels = np.concatenate(
                [flat, np.zeros((flat.shape[0], 1), np.float32)], -1)
            if spectral:
                scale = np.maximum(flat.max(-1), 1.0)
                coeffs = fit_sigmoid_coeffs(
                    flat / scale[:, None]).astype(np.float32)
                coeffs = np.concatenate(
                    [coeffs, scale[:, None].astype(np.float32)], -1)
            else:
                coeffs = np.zeros_like(texels)
            blobs.append((texels, coeffs))
            n_texels += flat.shape[0]
        elif d["kind"] == "checkerboard":
            kind[i] = CHECKERBOARD
            c0[i] = np.asarray(d.get("color0", 0.4), np.float32) \
                * np.ones(3, np.float32)
            c1[i] = np.asarray(d.get("color1", 0.2), np.float32) \
                * np.ones(3, np.float32)
            wl = np.arange(320.0, 721.0, 40.0)
            c0s[i] = upsample_rgb(c0[i], wl)[0]
            c1s[i] = upsample_rgb(c1[i], wl)[0]
        else:
            kind[i] = BITMAP
            img = np.asarray(d["data"], np.float32)
            if img.ndim == 2:
                img = img[..., None]
            if img.shape[-1] == 1:
                img = np.repeat(img, 3, axis=-1)
            img = img[..., :3]
            h, w = img.shape[:2]
            wrap[i] = wrap_map[d.get("wrap", "repeat")]
            offset[i] = n_texels
            width[i] = w
            height[i] = h
            flat = img.reshape(-1, 3)
            texels = np.concatenate(
                [flat, np.zeros((flat.shape[0], 1), np.float32)], -1)
            if spectral:
                scale = np.maximum(flat.max(-1), 1.0)
                coeffs = fit_sigmoid_coeffs(
                    flat / scale[:, None]).astype(np.float32)
                coeffs = np.concatenate(
                    [coeffs, scale[:, None].astype(np.float32)], -1)
            else:
                coeffs = np.zeros_like(texels)
            blobs.append((texels, coeffs))
            n_texels += flat.shape[0]

    if blobs:
        atlas = np.concatenate([b[0] for b in blobs])
        atlas_c = np.concatenate([b[1] for b in blobs])
    else:   # one dummy texel keeps every shape static and gathers valid
        atlas = np.zeros((1, 4), np.float32)
        atlas_c = np.zeros((1, 4), np.float32)
    return TextureTable(jnp.asarray(kind), jnp.asarray(c0), jnp.asarray(c1),
                        jnp.asarray(c0s), jnp.asarray(c1s),
                        jnp.asarray(uvt), jnp.asarray(wrap),
                        jnp.asarray(offset), jnp.asarray(width),
                        jnp.asarray(height), jnp.asarray(atlas),
                        jnp.asarray(atlas_c), jnp.asarray(depth),
                        jnp.asarray(w2t), jnp.asarray(attr_scale))


def _wrap_coord(x, n, mode):
    """Wrap integer texel coordinates per the per-lane wrap mode."""
    nf = n.astype(x.dtype)
    rep = x - nf * jnp.floor(x / nf)
    period = 2.0 * nf
    m = x - period * jnp.floor(x / period)
    mir = jnp.where(m >= nf, period - 1.0 - m, m)
    clp = jnp.clip(x, 0.0, nf - 1.0)
    out = jnp.where(mode == WRAP_REPEAT, rep,
                    jnp.where(mode == WRAP_MIRROR, mir, clp))
    return jnp.clip(out, 0.0, nf - 1.0)


def _spec_lerp(spec_rows, wavelengths):
    """(..., 11) spectra on the 320..720 grid -> values at (..., W)
    wavelengths (mask-select over the static channel axis, like
    bsdf._reflectance)."""
    norm = jnp.clip((wavelengths - 320.0) / 40.0, 0.0, 10.0)
    lo = jnp.clip(jnp.floor(norm).astype(jnp.int32), 0, 9)
    t = norm - lo
    ids = jnp.arange(spec_rows.shape[-1])
    sel_lo = (lo[..., :, None] == ids).astype(spec_rows.dtype)
    sel_hi = (lo[..., :, None] + 1 == ids).astype(spec_rows.dtype)
    v_lo = jnp.sum(spec_rows[..., None, :] * sel_lo, axis=-1)
    v_hi = jnp.sum(spec_rows[..., None, :] * sel_hi, axis=-1)
    return (1.0 - t) * v_lo + t * v_hi


def _sigmoid_eval(coeffs, wavelengths):
    """Per-lane sigmoid-polynomial spectra: coeffs (..., 4) = (c0, c1, c2,
    scale) -> (..., W)."""
    x = (wavelengths - _LAM_MIN) / (_LAM_MAX - _LAM_MIN)
    t = (coeffs[..., 0:1] * x * x + coeffs[..., 1:2] * x
         + coeffs[..., 2:3])
    return (0.5 + 0.5 * t / jnp.sqrt(1.0 + t * t)) * coeffs[..., 3:4]


def table_texture_kinds(tex: TextureTable):
    """Static kind descriptor for a CONCRETE texture table (the texture
    analogue of `bsdf.table_kinds`): tuple of kinds present, or None for
    tracers (= compute-and-mask every kind)."""
    import numpy as np
    if tex is None:
        return ()
    try:
        return tuple(sorted(int(k) for k in np.unique(np.asarray(tex.kind))))
    except Exception:
        return None


def eval_texture(tex: TextureTable, tex_idx, uv, wavelengths=None,
                 p=None, attr=None, tkinds=None):
    """Evaluate per-lane textures at `uv`.

    tex_idx (...,) int32 (negative = no texture), uv (..., 2).
    `p` (..., 3): world hit position (volume textures); `attr` (..., 3):
    interpolated per-vertex data (mesh_attribute textures); `tkinds`:
    static descriptor from `table_texture_kinds` — absent kinds are
    skipped at trace time (None = the uv-kinds only, for legacy callers).
    Returns (value (..., C), has_tex (...,)) — value is undefined where
    has_tex is False.
    """
    has = tex_idx >= 0
    idx = jnp.maximum(tex_idx, 0)
    kind = take_ints(tex.kind, idx)

    def has_kind(k):
        if tkinds is None:
            return k in (CHECKERBOARD, BITMAP)
        return k in tkinds

    value_extra = None
    # ---- 3D volume texture (`volume.cpp` over `grid.cpp` data) ----
    if has_kind(VOLUME) and p is not None:
        m4 = jnp.einsum("...k,kij->...ij",
                        (idx[..., None] == jnp.arange(tex.kind.shape[0]))
                        .astype(tex.world_to_tex.dtype), tex.world_to_tex, precision=jax.lax.Precision.HIGHEST)
        q = jnp.stack([
            m4[..., r, 0] * p[..., 0] + m4[..., r, 1] * p[..., 1]
            + m4[..., r, 2] * p[..., 2] + m4[..., r, 3] for r in range(3)],
            axis=-1)
        w_t = take_ints(tex.width, idx)
        h_t = take_ints(tex.height, idx)
        d_t = take_ints(tex.depth, idx)
        off = take_ints(tex.offset, idx)
        fx = jnp.clip(q[..., 0], 0.0, 1.0) * w_t.astype(q.dtype) - 0.5
        fy = jnp.clip(q[..., 1], 0.0, 1.0) * h_t.astype(q.dtype) - 0.5
        fz = jnp.clip(q[..., 2], 0.0, 1.0) * d_t.astype(q.dtype) - 0.5
        x0, y0, z0 = jnp.floor(fx), jnp.floor(fy), jnp.floor(fz)
        tx, ty, tz = fx - x0, fy - y0, fz - z0

        def vtap(xc, yc, zc):
            xi = jnp.clip(xc, 0.0, w_t.astype(xc.dtype) - 1.0) \
                .astype(jnp.int32)
            yi = jnp.clip(yc, 0.0, h_t.astype(yc.dtype) - 1.0) \
                .astype(jnp.int32)
            zi = jnp.clip(zc, 0.0, d_t.astype(zc.dtype) - 1.0) \
                .astype(jnp.int32)
            flat = off + (zi * h_t + yi) * w_t + xi
            if wavelengths is None:
                return jnp.take(tex.atlas, flat, axis=0)[..., :3]
            return _sigmoid_eval(jnp.take(tex.atlas_coeff, flat, axis=0),
                                 wavelengths)

        tri = 0.0
        for dz_, wz in ((0.0, 1.0 - tz), (1.0, tz)):
            for dy_, wy in ((0.0, 1.0 - ty), (1.0, ty)):
                for dx_, wx in ((0.0, 1.0 - tx), (1.0, tx)):
                    tri = tri + (wz * wy * wx)[..., None] * vtap(
                        x0 + dx_, y0 + dy_, z0 + dz_)
        value_extra = (kind == VOLUME, tri)

    # ---- per-vertex mesh attribute (`mesh_attribute.cpp`) ----
    if has_kind(MESH_ATTR) and attr is not None:
        sc = take_scalars(tex.attr_scale, idx)
        v_attr = attr * sc[..., None]
        if wavelengths is not None:
            # spectral fallback: channel-mean (constant spectrum), like
            # RGB-valued area emitters in spectral transport
            v_attr = jnp.broadcast_to(
                jnp.mean(v_attr, axis=-1, keepdims=True),
                v_attr.shape[:-1] + (wavelengths.shape[-1],))
        mask = (kind == MESH_ATTR)
        if value_extra is None:
            value_extra = (mask, v_attr)
        else:
            pm, pv = value_extra
            value_extra = (pm | mask,
                           jnp.where(mask[..., None], v_attr, pv))

    # apply the affine to_uv transform (small static T: one-hot fetch)
    m = jnp.einsum("...k,kij->...ij",
                   (idx[..., None] == jnp.arange(tex.kind.shape[0]))
                   .astype(tex.uv_transform.dtype), tex.uv_transform, precision=jax.lax.Precision.HIGHEST)
    u = m[..., 0, 0] * uv[..., 0] + m[..., 0, 1] * uv[..., 1] + m[..., 0, 2]
    v = m[..., 1, 0] * uv[..., 0] + m[..., 1, 1] * uv[..., 1] + m[..., 1, 2]
    # Inactive lanes (ray misses) can carry inf/NaN uv; their VALUE is
    # masked downstream, but a non-finite bilinear WEIGHT poisons the
    # texel-data cotangent through the gather transpose (0 * NaN — the
    # weights multiply the cotangent that scatter-adds into the atlas).
    # Pin them to a harmless in-range coordinate.
    ok_uv = jnp.isfinite(u) & jnp.isfinite(v) & has
    u = jnp.where(ok_uv, u, 0.5)
    v = jnp.where(ok_uv, v, 0.5)

    nc = 3 if wavelengths is None else wavelengths.shape[-1]
    value = jnp.zeros(idx.shape + (nc,))

    # ---- checkerboard (`checkerboard.cpp:70-89`) ----
    if has_kind(CHECKERBOARD):
        mx = (u - jnp.floor(u)) > 0.5
        my = (v - jnp.floor(v)) > 0.5
        use0 = mx == my
        if wavelengths is None:
            col0 = take_rows(tex.color0, idx)
            col1 = take_rows(tex.color1, idx)
        else:
            col0 = _spec_lerp(take_rows(tex.color0_spec, idx), wavelengths)
            col1 = _spec_lerp(take_rows(tex.color1_spec, idx), wavelengths)
        checker = jnp.where(use0[..., None], col0, col1)
        value = jnp.where((kind == CHECKERBOARD)[..., None], checker, value)

    # ---- bitmap: bilinear from the packed atlas ----
    if has_kind(BITMAP):
        w_t = take_ints(tex.width, idx)
        h_t = take_ints(tex.height, idx)
        off = take_ints(tex.offset, idx)
        wrap = take_ints(tex.wrap, idx)
        # uv (0,0) = top-left texel corner, v grows downward (image rows)
        fx = u * w_t.astype(u.dtype) - 0.5
        fy = v * h_t.astype(v.dtype) - 0.5
        x0f, y0f = jnp.floor(fx), jnp.floor(fy)
        tx, ty = fx - x0f, fy - y0f

        def tap(xc, yc):
            xw = _wrap_coord(xc, w_t, wrap).astype(jnp.int32)
            yw = _wrap_coord(yc, h_t, wrap).astype(jnp.int32)
            flat = off + yw * w_t + xw
            if wavelengths is None:
                return jnp.take(tex.atlas, flat, axis=0)[..., :3]
            return _sigmoid_eval(jnp.take(tex.atlas_coeff, flat, axis=0),
                                 wavelengths)

        v00 = tap(x0f, y0f)
        v10 = tap(x0f + 1.0, y0f)
        v01 = tap(x0f, y0f + 1.0)
        v11 = tap(x0f + 1.0, y0f + 1.0)
        bi = ((1 - tx) * (1 - ty))[..., None] * v00 \
            + (tx * (1 - ty))[..., None] * v10 \
            + ((1 - tx) * ty)[..., None] * v01 \
            + (tx * ty)[..., None] * v11
        value = jnp.where((kind == BITMAP)[..., None], bi, value)

    if value_extra is not None:
        em, ev = value_extra
        value = jnp.where(em[..., None], ev, value)
    return value, has
