"""Scene-dictionary loader: the `mi.load_dict` equivalent.

Accepts Mitsuba-3-style nested dicts (reference dict path
`src/core/python/xml_v.cpp:116-499`) and assembles a renderable bundle.
The plugin registry is a plain dict of builder functions (the TPU-native
replacement for the reference's dynamic `PluginManager`, `plugin.h:54` —
no shared objects, no RTTI; SURVEY.md H14). Register custom plugins with
`register_plugin(kind, name, builder)`.

Supported types:
  integrators: path, direct, depth, aov, moment, ptracer, stokes,
               volpath, volpathmis, prbvolpath
  sensors:     perspective, orthographic, spherical, thinlens, distant,
               radiancemeter, irradiancemeter, batch
  film:        hdrfilm, specfilm (rfilter box/gaussian/tent/lanczos/
               mitchell/catmullrom)
  sampler:     independent, stratified, multijitter, orthogonal, sobol
  shapes:      rectangle, sphere, disk, cube, cylinder, obj, ply,
               serialized, sdfgrid, linearcurve, bsplinecurve,
               instance/shapegroup, merge
  bsdfs:       diffuse, twosided, mask, null, conductor, roughconductor,
               dielectric, roughdielectric, thindielectric, plastic,
               roughplastic, principled, principledthin, hair, measured,
               blendbsdf, bumpmap, normalmap, polarizer, retarder,
               circular, pplastic, measured_polarized
  emitters:    sunsky, constant, envmap, area (on shapes), point,
               directional, spot, projector, directionalarea
  media:       homogeneous, heterogeneous (gridvolume); 6 phase functions
  spectra:     float | [r, g, b] | {'type': 'rgb'|'srgb'|'uniform'|
               'regular'|'irregular'|'blackbody'|'d65', ...}
  textures:    bitmap, checkerboard (+scale/to_uv transforms)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.sunsky import constants as skyC
from ..models.sunsky import model as sunsky_model
from ..models.sunsky.astronomy import DateTimeRecord, LocationRecord
from ..models.sunsky.astronomy import sun_direction as astro_sun_direction
from ..models.sunsky.tables import load_tables
from ..utils import transform as T
from . import integrator as integrator_mod
from .emitters import ConstantEnv, UniformEnv
from .film import Film
from .scene import make_scene
from .sensors import Orthographic, Perspective, make_spherical
from .shapes import CUBE, CYLINDER, DISK, RECTANGLE, SPHERE

_SHAPE_KINDS = {"rectangle": RECTANGLE, "sphere": SPHERE, "disk": DISK,
                "cube": CUBE, "cylinder": CYLINDER}

_PLUGIN_REGISTRY: Dict[str, Dict[str, Callable]] = {}


def register_plugin(kind: str, name: str, builder: Callable) -> None:
    """Register a custom builder, e.g. register_plugin('sensor', 'fisheye',
    fn) — the equivalent of `mi.register_sensor` (`sunsky_plugin.py:186`)."""
    _PLUGIN_REGISTRY.setdefault(kind, {})[name] = builder


# ---------------------------------------------------------------------------
# Spectrum parsing
# ---------------------------------------------------------------------------


def _parse_number_list(v):
    if isinstance(v, str):
        return np.array([float(x) for x in v.replace(",", " ").split()])
    return np.asarray(v, np.float64)


def spectrum_to_channels(value, mode: str) -> np.ndarray:
    """Evaluate a spectrum description at the model's channels.

    RGB mode -> (3,); spectral mode -> (11,) at 320..720nm step 40
    (the wavelengths the sunsky datasets use; reference `sunsky.h:29-32`).
    Handles the reference's `uniform`, `regular`, `irregular`, and rgb
    spectra (`src/spectra/`).
    """
    wl = skyC.WAVELENGTHS
    if isinstance(value, (int, float)):
        return np.full(3 if mode == "rgb" else 11, float(value))
    if isinstance(value, (list, tuple, np.ndarray)):
        arr = np.asarray(value, np.float64)
        if mode == "rgb":
            return np.broadcast_to(arr, (3,)).copy()
        # rgb given in spectral mode: sigmoid-polynomial upsampling, the
        # reference's rgb2spec path (`src/render/srgb.cpp:14`)
        from ..ops.rgb2spec import upsample_rgb
        return upsample_rgb(np.broadcast_to(arr, (3,)), wl)[0]
    if isinstance(value, dict):
        t = value["type"]
        if t == "uniform":
            return np.full(3 if mode == "rgb" else 11,
                           float(value.get("value", 1.0)))
        if t in ("rgb", "srgb"):
            # `srgb` (`src/spectra/srgb.cpp`) is the explicit plugin name
            # for the rgb2spec upsampling that `rgb` values also take
            arr = np.broadcast_to(
                np.asarray(value.get("value", value.get("color", 1.0)),
                           np.float64), (3,))
            if mode == "rgb":
                return arr.copy()
            from ..ops.rgb2spec import upsample_rgb
            return upsample_rgb(arr, wl)[0]
        if t == "irregular":
            w = _parse_number_list(value["wavelengths"])
            v = _parse_number_list(value["values"])
            if mode == "rgb":
                return np.full(3, np.interp([600, 550, 450], w, v).mean())
            return np.interp(wl, w, v)
        if t == "blackbody":
            # Planck spectral radiance (W / m^2 / sr / nm), the reference's
            # `src/spectra/blackbody.cpp`
            temp = float(value.get("temperature", 5778.0))
            h_pl, c, kb = 6.62607015e-34, 2.99792458e8, 1.380649e-23
            lam = (np.array([600, 550, 450.0]) if mode == "rgb"
                   else wl) * 1e-9
            rad = (2 * h_pl * c * c / lam ** 5
                   / (np.exp(h_pl * c / (lam * kb * temp)) - 1.0)) * 1e-9
            scale = float(value.get("scale", 1.0))
            return rad * scale
        if t == "d65":
            from ..ops.spectrum import cie_d65
            import jax.numpy as _jnp
            lam = np.array([600, 550, 450.0]) if mode == "rgb" else wl
            return np.asarray(cie_d65(_jnp.asarray(lam)))                 * float(value.get("scale", 1.0))
        if t == "regular":
            lo = float(value.get("lambda_min", value.get("wavelength_min",
                                                         360.0)))
            hi = float(value.get("lambda_max", value.get("wavelength_max",
                                                         830.0)))
            v = _parse_number_list(value["values"])
            w = np.linspace(lo, hi, len(v))
            if mode == "rgb":
                return np.full(3, v.mean())
            return np.interp(wl, w, v)
    raise ValueError(f"cannot parse spectrum {value!r}")


# ---------------------------------------------------------------------------
# Bundle
# ---------------------------------------------------------------------------


def _medium_replace(med, idx, **kw):
    """Replace fields of region ``idx`` in ``scene.medium`` (a single
    Medium or a tuple of per-shape regions — see render/medium.py)."""
    from .medium import Medium
    if isinstance(med, Medium):
        return med._replace(**kw)
    lst = list(med)
    lst[idx] = lst[idx]._replace(**kw)
    return tuple(lst)


@dataclass
class SceneBundle:
    """Everything needed to render: the scene pytree plus configuration.

    `params` exposes the differentiable emitter parameters (the analogue of
    `mi.traverse`'s SceneParameters, `util.py:13`): replace leaves and call
    `render()` — the sunsky precompute re-derives inside the traced
    function.
    """
    sensor: Any
    film: Film
    integrator: str
    max_depth: int
    rr_depth: int
    spp: int
    mode: str
    sampler_kind: str
    env_kind: Optional[str]
    env_params: Any                      # SunskyParams | ConstantEnv | None
    scene_desc: dict = field(default_factory=dict)
    _scene_static: Any = None
    param_map: dict = field(default_factory=dict)

    @property
    def params(self):
        return self.env_params

    def traverse(self):
        """Scene-wide differentiable-parameter dictionary, the
        `mi.traverse` analogue (`util.py:13-331`): flat {path: leaf}
        spanning the emitter parameters, per-shape `to_world` transforms,
        BSDF reflectance/roughness, area-emitter radiance, texture data
        and medium extinction, with reference-style key names (e.g.
        `'plane.bsdf.reflectance.value'`). Mutate values and pass the
        dict back via `render(params=...)` / `build_scene(params=...)` —
        the scene (including the sunsky precompute) is re-derived inside
        the traced function, so everything here is differentiable."""
        out = {}
        if self.env_params is not None:
            if hasattr(self.env_params, "_fields"):
                out.update({f"emitter.{k}": v
                            for k, v in zip(self.env_params._fields,
                                            self.env_params)})
            else:
                import jax
                leaves, _ = jax.tree.flatten(self.env_params)
                out.update({f"emitter.{i}": v
                            for i, v in enumerate(leaves)})
        sc = self._scene_static
        for name, info in self.param_map.items():
            if info.get("shape") is not None:
                j = info["shape"]
                out[f"{name}.to_world"] = sc.shapes.to_world[j]
                if info.get("emitter") is not None:
                    out[f"{name}.emitter.radiance.value"] = \
                        sc.area_radiance[j]
            if info.get("bsdf") is not None:
                b = info["bsdf"]
                out[f"{name}.bsdf.reflectance.value"] = sc.bsdfs.albedo[b]
                out[f"{name}.bsdf.alpha.value"] = sc.bsdfs.alpha[b]
                tex = int(info.get("mat", {}).get("tex_idx", -1))
                if tex >= 0 and sc.textures is not None:
                    t = sc.textures
                    off = int(t.offset[tex])
                    wd, hg = int(t.width[tex]), int(t.height[tex])
                    out[f"{name}.bsdf.reflectance.data"] = \
                        t.atlas[off:off + wd * hg, :3].reshape(hg, wd, 3)
            if info.get("medium") is not None:
                from .medium import Medium as _Medium
                mi = (sc.medium if isinstance(sc.medium, _Medium)
                      else sc.medium[info["medium"]])
                out[f"{name}.sigma_t"] = mi.sigma_t
                out[f"{name}.albedo"] = mi.albedo
        return out

    def _apply_params(self, scene, overrides):
        """Functionally apply a (possibly modified) `traverse()` dict to
        the scene pytree. Shape `to_world` updates re-derive `to_object`
        and `area` differentiably (`shapes.world_area_jnp`)."""
        from .shapes import world_area_jnp
        shapes, bsdfs = scene.shapes, scene.bsdfs
        tex, med = scene.textures, scene.medium
        area_rad = scene.area_radiance
        for key, v in overrides.items():
            if key.startswith("emitter."):
                continue                       # handled in build_scene
            name, _, rest = key.partition(".")
            info = self.param_map.get(name)
            if info is None:
                raise KeyError(f"unknown scene parameter {key!r}")
            v = jnp.asarray(v)
            if rest == "to_world":
                j = info["shape"]
                shapes = shapes._replace(
                    to_world=shapes.to_world.at[j].set(v),
                    to_object=shapes.to_object.at[j].set(
                        jnp.linalg.inv(v)),
                    area=shapes.area.at[j].set(
                        world_area_jnp(shapes.kind[j], v)))
            elif rest == "bsdf.reflectance.value":
                b = info["bsdf"]
                bsdfs = bsdfs._replace(
                    albedo=bsdfs.albedo.at[b].set(v))
                if self.mode == "spectral":
                    from ..ops.rgb2spec import upsample_rgb_jnp
                    wl = jnp.asarray(skyC.WAVELENGTHS, jnp.float32)
                    bsdfs = bsdfs._replace(
                        albedo_spec=bsdfs.albedo_spec.at[b].set(
                            upsample_rgb_jnp(v, wl)))
            elif rest == "bsdf.alpha.value":
                bsdfs = bsdfs._replace(
                    alpha=bsdfs.alpha.at[info["bsdf"]].set(v))
            elif rest == "bsdf.reflectance.data":
                t_i = int(info["mat"]["tex_idx"])
                off = int(tex.offset[t_i])
                flat = v.reshape(-1, 3)
                block = jnp.concatenate(
                    [flat, tex.atlas[off:off + flat.shape[0], 3:]], -1)
                tex = tex._replace(atlas=jax.lax.dynamic_update_slice(
                    tex.atlas, block, (off, 0)))
            elif rest == "emitter.radiance.value":
                area_rad = area_rad.at[info["shape"]].set(v)
            elif rest == "sigma_t" and info.get("medium") is not None:
                med = _medium_replace(med, info["medium"], sigma_t=v)
            elif rest == "albedo" and info.get("medium") is not None:
                med = _medium_replace(med, info["medium"], albedo=v)
            else:
                raise KeyError(f"unknown scene parameter {key!r}")
        return scene._replace(shapes=shapes, bsdfs=bsdfs, textures=tex,
                              medium=med, area_radiance=area_rad)

    def build_scene(self, env_params=None, params=None):
        env_params = self.env_params if env_params is None else env_params
        if params:
            em = {k.split(".", 1)[1]: v for k, v in params.items()
                  if k.startswith("emitter.")}
            if em and hasattr(env_params, "_replace"):
                env_params = env_params._replace(**em)
        if self.env_kind == "sunsky":
            tables = load_tables(self.mode)
            env = sunsky_model.precompute(tables, env_params, self.mode)
        elif self.env_kind == "constant":
            env = env_params
        else:
            env = None
        scene = self._scene_static._replace(env=env)
        if params:
            scene = self._apply_params(scene, params)
        return scene

    def render(self, seed: int = 0, spp: Optional[int] = None,
               env_params=None, params=None):
        scene = self.build_scene(env_params, params)
        key = jax.random.PRNGKey(seed)
        spp = spp or self.spp
        if self.integrator in ("aov", "depth"):
            from .aov import render_aovs
            idesc = next((v for v in self.scene_desc.values()
                          if isinstance(v, dict)
                          and v.get("type") in ("aov", "depth")), {})
            child_desc = next((v for v in idesc.values()
                               if isinstance(v, dict)
                               and v.get("type") in ("path", "direct")),
                              None)
            child = child_kw = None
            if child_desc is not None:      # nested integrator, aov.cpp:126
                child = child_desc["type"]
                child_kw = dict(spp=spp or self.spp,
                                max_depth=int(child_desc.get(
                                    "max_depth", 2)), mode=self.mode)
            aovs = render_aovs(scene, self.sensor, self.film.height,
                               self.film.width, aovs=idesc.get("aovs"),
                               child=child, child_kwargs=child_kw)
            return aovs["depth"] if self.integrator == "depth" else aovs
        if self.integrator == "moment":
            return integrator_mod.render_moments(
                scene, self.sensor, self.film, key, spp=spp,
                max_depth=self.max_depth, rr_depth=self.rr_depth,
                mode=self.mode, sampler_kind=self.sampler_kind)
        if self.integrator == "ptracer":
            from .ptracer import render_ptracer
            n_particles = self.film.height * self.film.width * spp
            return render_ptracer(scene, self.sensor, self.film, key,
                                  n_particles=n_particles,
                                  max_depth=self.max_depth,
                                  sampler_kind=self.sampler_kind,
                                  mode=self.mode)
        if self.integrator == "stokes":
            from .polarized import render_stokes
            return render_stokes(scene, self.sensor, self.film, key,
                                 spp=spp, max_depth=self.max_depth,
                                 rr_depth=self.rr_depth,
                                 sampler_kind=self.sampler_kind,
                                 mode=self.mode)
        return integrator_mod.render(
            scene, self.sensor, self.film, key,
            spp=spp, max_depth=self.max_depth,
            rr_depth=self.rr_depth, mode=self.mode,
            sampler_kind=self.sampler_kind)


# ---------------------------------------------------------------------------
# Loader
# ---------------------------------------------------------------------------


def _one_transform(op: str, arg) -> np.ndarray:
    if op == "translate":
        return T.translate(arg)
    if op == "scale":
        return T.scale(arg)
    if op == "rotate":
        if isinstance(arg, dict):
            return T.rotate(arg["axis"], float(arg["angle"]))
        arg = np.asarray(arg, np.float64)
        return T.rotate(arg[:3], float(arg[3]))
    if op in ("look_at", "lookat"):
        return T.look_at(arg["origin"], arg["target"],
                         arg.get("up", (0, 0, 1)))
    if op == "matrix":
        return np.asarray(arg, np.float32).reshape(4, 4)
    raise ValueError(f"unsupported transform op {op!r}")


def _parse_to_world(v) -> np.ndarray:
    """4x4 from: None, (4,4) array, {'type': 'look_at', ...},
    {'look_at': {...}}, {'matrix': ...}, or a sequential chain
    {'transforms': [{op: arg}, ...]} (applied first-to-last, i.e. the last
    entry acts last in world space — the reference's `<transform>` XML
    semantics, `src/core/xml.cpp` transform tag handling)."""
    if v is None:
        return np.eye(4, dtype=np.float32)
    if isinstance(v, dict):
        if v.get("type") in ("look_at", "lookat"):
            return T.look_at(v["origin"], v["target"], v.get("up", (0, 0, 1)))
        if "transforms" in v:
            m = np.eye(4, dtype=np.float32)
            for step in v["transforms"]:
                (op, arg), = step.items()
                m = _one_transform(op, arg).astype(np.float32) @ m
            return m
        if set(v) == {"type", "value"}:
            return _one_transform(v["type"], v["value"]).astype(np.float32)
        if len(v) == 1:
            (op, arg), = v.items()
            return _one_transform(op, arg).astype(np.float32)
        raise ValueError(f"unsupported transform dict {v}")
    arr = np.asarray(v, np.float32)
    assert arr.shape == (4, 4), arr.shape
    return arr


# Named conductor IORs at RGB primaries (standard tabulated optical
# constants, as shipped by the reference's `data/ior/*.spd` files)
_CONDUCTOR_IOR = {
    "Au": ([0.143, 0.375, 1.442], [3.983, 2.386, 1.603]),
    "Ag": ([0.155, 0.116, 0.138], [4.828, 3.122, 2.146]),
    "Cu": ([0.200, 0.924, 1.102], [3.912, 2.448, 2.167]),
    "Al": ([1.345, 0.965, 0.617], [7.475, 6.400, 5.303]),
    "none": ([0.0, 0.0, 0.0], [1e4, 1e4, 1e4]),  # perfect mirror
}


def _parse_to_uv(v):
    """3x3 uv transform from None / (3,3) array / {'scale': s|[sx,sy]} /
    {'translate': [tx,ty]} / {'transforms': [...]} (the reference's
    `to_uv` Transform3f property)."""
    if v is None:
        return None

    def one(op, arg):
        m = np.eye(3, dtype=np.float32)
        if op == "scale":
            s = np.broadcast_to(np.asarray(arg, np.float32), (2,)) \
                if np.ndim(arg) else np.array([arg, arg], np.float32)
            m[0, 0], m[1, 1] = float(np.atleast_1d(s)[0]), \
                float(np.atleast_1d(s)[-1])
        elif op == "translate":
            t = np.atleast_1d(np.asarray(arg, np.float32))
            m[0, 2], m[1, 2] = float(t[0]), float(t[-1])
        elif op == "rotate":
            a = np.deg2rad(float(arg))
            m[0, 0] = m[1, 1] = np.cos(a)
            m[0, 1], m[1, 0] = -np.sin(a), np.sin(a)
        elif op == "matrix":
            m = np.asarray(arg, np.float32).reshape(3, 3)
        else:
            raise ValueError(f"unsupported to_uv op {op!r}")
        return m

    if isinstance(v, dict):
        if "transforms" in v:
            m = np.eye(3, dtype=np.float32)
            for step in v["transforms"]:
                (op, arg), = step.items()
                m = one(op, arg) @ m
            return m
        m = np.eye(3, dtype=np.float32)
        for op, arg in v.items():
            m = one(op, arg) @ m
        return m
    arr = np.asarray(v, np.float32)
    return arr.reshape(3, 3)


def _load_bitmap(desc):
    """(H, W, 3) float32 linear image from an inline array or a file."""
    if "data" in desc or "bitmap" in desc:
        return np.asarray(desc.get("data", desc.get("bitmap")), np.float32)
    fn = desc["filename"]
    if fn.lower().endswith(".exr"):
        from ..utils.io import read_exr
        img, names = read_exr(fn)
        return img[..., ::-1] if names[:3] == ["B", "G", "R"] else img
    if fn.lower().endswith(".png"):
        from ..utils.io import read_png
        img = read_png(fn)
        if not desc.get("raw", False):   # sRGB -> linear (`bitmap.cpp`)
            img = np.where(img <= 0.04045, img / 12.92,
                           ((img + 0.055) / 1.055) ** 2.4)
        return img.astype(np.float32)
    raise ValueError(f"unsupported bitmap format: {fn!r}")


def _parse_texture(desc, textures):
    """Append a texture description; return its index."""
    t = desc["type"]
    if t == "checkerboard":
        textures.append(dict(
            kind="checkerboard",
            color0=spectrum_to_channels(desc.get("color0", 0.4), "rgb"),
            color1=spectrum_to_channels(desc.get("color1", 0.2), "rgb"),
            to_uv=_parse_to_uv(desc.get("to_uv"))))
    elif t == "bitmap":
        textures.append(dict(kind="bitmap", data=_load_bitmap(desc),
                             to_uv=_parse_to_uv(desc.get("to_uv")),
                             wrap=desc.get("wrap_mode", "repeat")))
    elif t == "volume":
        # 3D texture (`volume.cpp`): wraps a gridvolume / constvolume /
        # inline grid, evaluated at the world-space hit position
        vol = next((v for v in desc.values()
                    if isinstance(v, dict) and v.get("type")
                    in ("gridvolume", "constvolume")), desc)
        to_world = _parse_to_world(vol.get("to_world",
                                           desc.get("to_world")))
        if vol.get("type") == "gridvolume":
            from ..utils.io import read_vol
            grid, bmin, bmax = read_vol(vol["filename"])
            # bbox -> unit-cube mapping baked into to_world
            ext = np.maximum(bmax - bmin, 1e-9)
            bbox_m = np.eye(4, dtype=np.float32)
            bbox_m[:3, :3] = np.diag(ext)
            bbox_m[:3, 3] = bmin
            to_world = to_world @ bbox_m
        elif vol.get("type") == "constvolume":
            grid = np.broadcast_to(
                spectrum_to_channels(vol.get("value", 1.0), "rgb"),
                (1, 1, 1, 3)).astype(np.float32)
        else:
            grid = np.asarray(desc["grid"], np.float32)
        textures.append(dict(kind="volume", grid=grid, to_world=to_world))
    elif t == "mesh_attribute":
        name = desc.get("name", "vertex_color")
        if name != "vertex_color":
            raise ValueError("only the 'vertex_color' mesh attribute is "
                             f"supported, got {name!r}")
        textures.append(dict(kind="mesh_attribute",
                             scale=float(desc.get("scale", 1.0))))
    else:
        raise ValueError(f"unsupported texture type {t!r}")
    return len(textures) - 1


def _build_bsdf(desc, mode, textures=None, materials=None):
    """-> material dict {kind, rgb, spec, twosided, alpha, eta, k, ior,
    opacity, tex_idx, blend_a, blend_b, blend_w}.

    A `blendbsdf` (`src/bsdfs/blendbsdf.cpp`) appends its two children to
    `materials` and returns a kind-10 row referencing them; the blend's
    twosided/opacity wrappers are pushed down onto the children so the
    branch-free core applies them per child row.
    """
    from .bsdf import (BLEND, CIRCULAR, CONDUCTOR, DIELECTRIC, DIFFUSE,
                       HAIR, MEASURED, MEASURED_POL, NULL_BSDF, PLASTIC,
                       POLARIZER, PPLASTIC, PRINCIPLED, PRINCIPLED_THIN,
                       RETARDER, ROUGH_CONDUCTOR, ROUGH_DIELECTRIC,
                       ROUGH_PLASTIC, THIN_DIELECTRIC)
    twosided = False
    opacity = 1.0
    normal_tex_idx = -1
    _WRAPPERS = ("twosided", "mask", "normalmap", "bumpmap")
    while desc.get("type") in _WRAPPERS:
        t_w = desc.get("type")
        if t_w == "twosided":
            twosided = True
        elif t_w == "mask":   # `mask.cpp`: scalar opacity + nested BSDF
            op = desc.get("opacity", 0.5)
            opacity = float(np.mean(spectrum_to_channels(op, "rgb")))
        elif t_w == "normalmap":   # `normalmap.cpp`: tangent-space map
            if textures is None:
                raise ValueError("normalmap not supported here")
            nm = desc.get("normalmap")
            img = _load_bitmap(dict(nm, raw=True))
            textures.append(dict(kind="bitmap", data=img,
                                 to_uv=_parse_to_uv(nm.get("to_uv")),
                                 wrap=nm.get("wrap_mode", "repeat")))
            normal_tex_idx = len(textures) - 1
        else:                      # `bumpmap.cpp`: heightfield -> normals
            if textures is None:
                raise ValueError("bumpmap not supported here")
            bm = desc.get("bump_texture", desc.get("texture"))
            height = _load_bitmap(dict(bm, raw=True))
            if height.ndim == 3:
                height = height.mean(-1)
            s = float(desc.get("scale", 1.0))
            h_img, w_img = height.shape
            # central differences (one-sided at the borders) in uv units;
            # v grows down the rows
            dhdv, dhdu = np.gradient(height)
            dhdu = dhdu * w_img
            dhdv = dhdv * h_img
            nrm = np.stack([-s * dhdu, -s * dhdv, np.ones_like(height)],
                           -1)
            nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
            textures.append(dict(kind="bitmap",
                                 data=(nrm * 0.5 + 0.5).astype(np.float32),
                                 to_uv=_parse_to_uv(bm.get("to_uv")),
                                 wrap=bm.get("wrap_mode", "repeat")))
            normal_tex_idx = len(textures) - 1
        inner = [v for v in desc.values() if isinstance(v, dict)
                 and v.get("type") not in (None, "checkerboard", "bitmap")
                 and v.get("type") not in _WRAPPERS]
        nested = [v for v in desc.values() if isinstance(v, dict)
                  and v.get("type") in _WRAPPERS]
        desc = (inner[0] if inner else
                nested[0] if nested else {"type": "diffuse"})
    t = desc.get("type", "diffuse")
    mat = dict(kind=DIFFUSE, rgb=np.full(3, 0.5), spec=np.full(11, 0.5),
               twosided=twosided, alpha=0.1,
               eta=np.array(_CONDUCTOR_IOR["Au"][0]),
               k=np.array(_CONDUCTOR_IOR["Au"][1]), ior=1.5046,
               opacity=opacity, tex_idx=-1, normal_tex_idx=normal_tex_idx,
               extra=np.array([0, 0.5, 0, 0, 0, 0, 0, 0], np.float64),
               blend_a=0, blend_b=0, blend_w=0.0)

    if t == "blendbsdf":
        if materials is None:
            raise ValueError("blendbsdf not supported here")
        children = [v for v in desc.values() if isinstance(v, dict)
                    and "type" in v
                    and v.get("type") not in ("checkerboard", "bitmap")]
        if len(children) != 2:
            raise ValueError("blendbsdf needs exactly two nested BSDFs")
        w = desc.get("weight", 0.5)
        if isinstance(w, dict):
            raise ValueError("blendbsdf: textured weight not supported")
        idx = []
        for child in children:
            cm = _build_bsdf(child, mode, textures, materials)
            if cm["kind"] == BLEND:
                raise ValueError("blendbsdf: nested blends not supported")
            cm["twosided"] = cm["twosided"] or twosided
            cm["opacity"] = cm["opacity"] * opacity
            if normal_tex_idx >= 0 and cm["normal_tex_idx"] < 0:
                cm["normal_tex_idx"] = normal_tex_idx
            idx.append(len(materials))
            materials.append(cm)
        mat.update(kind=BLEND, blend_a=idx[0], blend_b=idx[1],
                   blend_w=float(w), twosided=twosided, opacity=opacity)
        return mat

    def _refl(value):
        """Constant spectrum or nested texture plugin."""
        if (isinstance(value, dict)
                and value.get("type") in ("checkerboard", "bitmap",
                                          "volume", "mesh_attribute")):
            if textures is None:
                raise ValueError("textured reflectance not supported here")
            mat["tex_idx"] = _parse_texture(value, textures)
            return
        mat["rgb"] = spectrum_to_channels(value, "rgb")
        mat["spec"] = spectrum_to_channels(value, "spectral")

    if t == "diffuse":
        _refl(desc.get("reflectance", 0.5))
    elif t in ("roughconductor", "conductor"):
        mat["kind"] = ROUGH_CONDUCTOR if t == "roughconductor" else CONDUCTOR
        material = desc.get("material", "Au")
        if material not in _CONDUCTOR_IOR:
            raise ValueError(f"unknown conductor material {material!r}")
        mat["eta"] = np.asarray(desc.get("eta",
                                         _CONDUCTOR_IOR[material][0]))
        mat["k"] = np.asarray(desc.get("k", _CONDUCTOR_IOR[material][1]))
        mat["alpha"] = float(desc.get("alpha", 0.1))
        tint = desc.get("specular_reflectance", 1.0)
        mat["rgb"] = spectrum_to_channels(tint, "rgb")
        mat["spec"] = spectrum_to_channels(tint, "spectral")
    elif t in ("dielectric", "roughdielectric", "thindielectric"):
        mat["kind"] = {"dielectric": DIELECTRIC,
                       "roughdielectric": ROUGH_DIELECTRIC,
                       "thindielectric": THIN_DIELECTRIC}[t]
        int_ior = float(desc.get("int_ior", 1.5046))
        ext_ior = float(desc.get("ext_ior", 1.000277))
        mat["ior"] = int_ior / ext_ior
        mat["alpha"] = float(desc.get("alpha", 0.1))
        mat["rgb"] = np.ones(3)
        mat["spec"] = np.ones(11)
    elif t in ("plastic", "roughplastic"):
        mat["kind"] = PLASTIC if t == "plastic" else ROUGH_PLASTIC
        _refl(desc.get("diffuse_reflectance", 0.5))
        int_ior = float(desc.get("int_ior", 1.49))
        ext_ior = float(desc.get("ext_ior", 1.000277))
        mat["ior"] = int_ior / ext_ior
        mat["alpha"] = float(desc.get("alpha", 0.1))
    elif t == "principled":
        mat["kind"] = PRINCIPLED
        _refl(desc.get("base_color", 0.5))
        mat["alpha"] = float(desc.get("roughness", 0.5))
        # eta <-> specular correspondence (`principled.cpp:214-228`)
        if "eta" in desc and "specular" in desc:
            raise ValueError("principled: give either eta or specular")
        if "eta" in desc:
            e = float(desc["eta"])
            spec = ((e - 1.0) / (e + 1.0)) ** 2 / 0.08
        else:
            spec = float(desc.get("specular", 0.5))
        mat["extra"] = np.array([
            float(desc.get("metallic", 0.0)), spec,
            float(desc.get("sheen", 0.0)),
            float(desc.get("sheen_tint", 0.0)),
            float(desc.get("clearcoat", 0.0)),
            float(desc.get("clearcoat_gloss", 0.0)),
            float(desc.get("spec_tint", 0.0)), 0.0], np.float64)
    elif t == "principledthin":
        mat["kind"] = PRINCIPLED_THIN
        _refl(desc.get("base_color", 0.5))
        mat["alpha"] = float(desc.get("roughness", 0.5))
        mat["ior"] = float(desc.get("eta", 1.5))
        mat["extra"] = np.array([
            float(desc.get("spec_trans", 0.0)),
            # diff_trans has range [0, 2] in the reference
            # (`principledthin.cpp:283`); stored normalised to [0, 1]
            float(desc.get("diff_trans", 0.0)) / 2.0,
            float(desc.get("sheen", 0.0)),
            float(desc.get("sheen_tint", 0.0)),
            float(desc.get("flatness", 0.0)),
            float(desc.get("spec_tint", 0.0)), 0.0, 0.0], np.float64)
    elif t == "measured":
        mat["kind"] = MEASURED
        # the dataset itself is attached scene-wide (one per scene);
        # `load_dict` picks it up from this marker
        mat["measured_file"] = desc["filename"]
    elif t == "measured_polarized":
        mat["kind"] = MEASURED_POL
        mat["measured_pol_file"] = (
            desc["filename"], float(desc.get("alpha_sample", 0.1)),
            float(desc.get("wavelength", -1.0)))
    elif t == "hair":
        mat["kind"] = HAIR
        if "sigma_a" in desc and ("eumelanin" in desc
                                  or "pheomelanin" in desc):
            raise ValueError("hair: give either sigma_a or pigmentation, "
                             "not both")
        if "sigma_a" in desc:
            sig = desc["sigma_a"]
            mat["rgb"] = spectrum_to_channels(sig, "rgb")
            mat["spec"] = spectrum_to_channels(sig, "spectral")
        else:
            # pigmentation -> absorption, d'Eon et al. 2011 coefficients
            # (`hair.cpp:485-492`)
            eu = float(desc.get("eumelanin", 1.3))
            ph = float(desc.get("pheomelanin", 0.2))
            sig = (eu * np.array([0.419, 0.697, 1.37])
                   + ph * np.array([0.187, 0.4, 1.05]))
            mat["rgb"] = sig
            from ..ops.rgb2spec import upsample_rgb
            peak = max(float(sig.max()), 1.0)
            mat["spec"] = upsample_rgb(sig / peak,
                                       skyC.WAVELENGTHS)[0] * peak
        scale = float(desc.get("scale", 1.0))
        mat["rgb"] = np.asarray(mat["rgb"]) * scale
        mat["spec"] = np.asarray(mat["spec"]) * scale
        mat["alpha"] = float(desc.get("longitudinal_roughness", 0.3))
        int_ior = float(desc.get("int_ior", 1.55))       # amber
        ext_ior = float(desc.get("ext_ior", 1.000277))
        mat["ior"] = int_ior / ext_ior
        mat["extra"] = np.array([
            float(desc.get("azimuthal_roughness", 0.3)),
            float(desc.get("scale_tilt", 2.0)),
            0.0, 0.0, 0.0, 0.0, 0.0, 0.0], np.float64)
    elif t == "pplastic":
        mat["kind"] = PPLASTIC
        _refl(desc.get("diffuse_reflectance", 0.5))
        int_ior = float(desc.get("int_ior", 1.49))    # polypropylene
        ext_ior = float(desc.get("ext_ior", 1.000277))
        mat["ior"] = int_ior / ext_ior
        mat["alpha"] = float(desc.get("alpha", 0.1))
    elif t in ("polarizer", "retarder", "circular"):
        mat["kind"] = {"polarizer": POLARIZER, "retarder": RETARDER,
                       "circular": CIRCULAR}[t]
        trans = desc.get("transmittance", 1.0)
        mat["rgb"] = spectrum_to_channels(trans, "rgb")
        mat["spec"] = spectrum_to_channels(trans, "spectral")
        mat["extra"] = np.array([
            float(desc.get("theta", 0.0)),
            float(desc.get("delta", 90.0)),
            1.0 if desc.get("left_handed", False) else 0.0,
            0.0, 0.0, 0.0, 0.0, 0.0], np.float64)
    elif t == "null":
        mat["kind"] = NULL_BSDF
    else:
        raise ValueError(f"unsupported bsdf {t!r}")
    return mat


def _phase_child_kind(desc, slot, out):
    """One non-blend phase child -> ('hg'|'hg2'|'rayleigh'|'tab'|'sggx');
    fills the matching parameter slots of ``out`` (make_medium kwargs)."""
    t = desc.get("type", "isotropic")
    if t in ("isotropic", "hg"):
        g = float(desc.get("g", 0.0)) if t == "hg" else 0.0
        if slot == 0:
            out["g"] = g
            return "hg"
        out["g2"] = g
        return "hg2"
    if t == "rayleigh":
        return "rayleigh"
    if t == "tabphase":
        out["phase_tab"] = _parse_number_list(desc["values"])
        return "tab"
    if t == "sggx":
        s = desc.get("S", desc.get("s"))
        if isinstance(s, dict):   # constvolume with six values (`sggx.cpp`)
            if s.get("type") != "constvolume":
                raise ValueError("sggx: only a constvolume S is supported")
            s = s.get("value")
        out["sggx_s"] = np.asarray(s, np.float32).reshape(6)
        return "sggx"
    raise ValueError(f"unknown phase {t!r}")


def _parse_phase(desc) -> dict:
    """Phase-function description -> make_medium kwargs (reference
    `src/phase/`: isotropic, hg, rayleigh, tabphase, sggx, blendphase)."""
    out = {}
    if desc.get("type") == "blendphase":
        children = [v for v in desc.values()
                    if isinstance(v, dict) and v.get("type") not in
                    ("constvolume", "gridvolume", None)]
        if len(children) != 2:
            raise ValueError("blendphase needs exactly two children")
        w = desc.get("weight", 0.5)
        if isinstance(w, dict):
            w = w.get("value", 0.5)
        ka = _phase_child_kind(children[0], 0, out)
        kb = _phase_child_kind(children[1], 1 if ka in ("hg", "hg2") else 0,
                               out)
        if ka == kb and ka not in ("hg", "hg2"):
            raise ValueError("blendphase children must differ in type "
                             "(or both be hg)")
        # reference convention (`blendphase.cpp:138-144`): the SECOND
        # child is picked with probability `weight`; eval is
        # (1-w)·phase0 + w·phase1
        out["phase_w"] = float(w)
        out["phase"] = ("blend", ka, kb)
        return out
    out["phase"] = _phase_child_kind(desc, 0, out)
    return out


def _build_sensor(sensor_desc, w, h):
    """Construct a sensor pytree from a Mitsuba-style description."""
    st = sensor_desc["type"]
    to_world = _parse_to_world(sensor_desc.get("to_world"))
    if st == "thinlens":
        from .sensors import ThinLens
        fov = float(sensor_desc.get("fov", 45.0))
        return ThinLens(jnp.asarray(to_world),
                        jnp.asarray(fov, jnp.float32),
                        jnp.asarray(w / h, jnp.float32),
                        jnp.asarray(float(sensor_desc.get(
                            "aperture_radius", 0.1)), jnp.float32),
                        jnp.asarray(float(sensor_desc.get(
                            "focus_distance", 5.0)), jnp.float32))
    if st == "perspective":
        fov = float(sensor_desc.get("fov", 45.0))
        return Perspective(jnp.asarray(to_world),
                           jnp.asarray(fov, jnp.float32),
                           jnp.asarray(w / h, jnp.float32))
    if st == "orthographic":
        return Orthographic(jnp.asarray(to_world), jnp.float32(1.0))
    if st == "distant":
        from .sensors import make_distant
        return make_distant(
            sensor_desc.get("direction", tuple(-to_world[:3, 2])),
            center=sensor_desc.get("center", (0.0, 0.0, 0.0)),
            radius=float(sensor_desc.get("radius", 1.0)),
            extent=sensor_desc.get("extent"))
    if st == "radiancemeter":
        from .sensors import RadianceMeter
        o = np.asarray(sensor_desc.get("origin", to_world[:3, 3]),
                       np.float32)
        dr = np.asarray(sensor_desc.get("direction", to_world[:3, 2]),
                        np.float32)
        return RadianceMeter(jnp.asarray(o),
                             jnp.asarray(dr / np.linalg.norm(dr)))
    if st == "irradiancemeter":
        from .sensors import make_irradiancemeter
        return make_irradiancemeter(
            sensor_desc.get("origin", tuple(to_world[:3, 3])),
            sensor_desc.get("normal", tuple(to_world[:3, 2])),
            float(sensor_desc.get("half_extent", 1.0)))
    if st == "batch":
        from .sensors import Batch
        subs = [v for v in sensor_desc.values() if isinstance(v, dict)
                and v.get("type") in ("perspective", "orthographic",
                                      "spherical", "thinlens", "distant",
                                      "radiancemeter", "irradiancemeter")]
        k = max(len(subs), 1)
        return Batch(tuple(_build_sensor(s, w // k, h) for s in subs))
    return make_spherical(tuple(to_world[:3, 3]))


def _expand_instances(d: dict) -> dict:
    """Flatten shapegroup/instance pairs (reference `src/shapes/
    shapegroup.cpp`, `instance.cpp`) into plain shapes with composed
    transforms. The TPU scene is a flat SoA table, so instancing is a
    load-time expansion: each instance contributes copies of the group's
    children with `instance.to_world @ child.to_world`."""
    groups, rest = {}, {}
    for k, v in d.items():
        if isinstance(v, dict) and v.get("type") == "shapegroup":
            groups[k] = {kk: vv for kk, vv in v.items()
                         if isinstance(vv, dict) and "type" in vv}
        else:
            rest[k] = v
    if not groups and not any(isinstance(v, dict)
                              and v.get("type") == "instance"
                              for v in rest.values()):
        return d
    out = {}
    uid = 0
    for k, v in rest.items():
        if not (isinstance(v, dict) and v.get("type") == "instance"):
            out[k] = v
            continue
        ref = None
        for vv in v.values():
            if isinstance(vv, str) and vv in groups:
                ref = groups[vv]
            elif isinstance(vv, dict) and vv.get("type") == "shapegroup":
                ref = {kk: v3 for kk, v3 in vv.items()
                       if isinstance(v3, dict) and "type" in v3}
            elif isinstance(vv, dict) and vv.get("type") == "ref":
                ref = groups.get(vv.get("id"))
        if ref is None:
            raise ValueError(f"instance {k!r} references no shapegroup")
        m_inst = _parse_to_world(v.get("to_world"))
        for ck, cv in ref.items():
            child = dict(cv)
            child["to_world"] = (
                m_inst @ _parse_to_world(child.get("to_world")))
            out[f"{k}.{ck}.{uid}"] = child
            uid += 1
    return out


def _expand_merge(d: dict) -> dict:
    """Hoist the children of `merge` shapes (reference `src/shapes/
    merge.cpp` — a container that fuses compatible child meshes into one;
    the TPU scene is already one fused SoA/tile table, so merging
    degenerates to flattening the container)."""
    if not any(isinstance(v, dict) and v.get("type") == "merge"
               for v in d.values()):
        return d
    out, uid = {}, 0
    for k, v in d.items():
        if not (isinstance(v, dict) and v.get("type") == "merge"):
            out[k] = v
            continue
        m_outer = v.get("to_world")
        for ck, cv in v.items():
            if not (isinstance(cv, dict) and "type" in cv):
                continue
            child = dict(cv)
            if m_outer is not None:
                child["to_world"] = (
                    _parse_to_world(m_outer)
                    @ _parse_to_world(child.get("to_world")))
            out[f"{k}.{ck}.{uid}"] = child
            uid += 1
    return out


def load_dict(d: dict, mode: str = "rgb") -> SceneBundle:
    """Assemble a renderable bundle from a Mitsuba-style scene dict."""
    assert d.get("type") == "scene", "top-level dict must have type='scene'"
    d = _expand_merge(_expand_instances(d))

    integrator = {"type": "path"}
    top_level_sampler = None
    sensor_desc = None
    env_desc = None
    shapes, materials, areas, meshes = [], [], [], []
    curves = []
    textures = []
    point_lights, directional_lights, spot_lights = [], [], []
    point_weights, dir_weights, spot_weights = [], [], []
    dir_areas = {}   # shape list index -> radiance (directionalarea)
    media_list = []  # per-shape participating media (render/medium.py);
    #                  the scene carries a single Medium or a tuple of
    #                  regions (the reference's per-shape `interior` refs)
    sdf_grid = None  # SDF grid shape (render/sdf.py)
    param_map = {}   # scene-dict key -> {"shape"/"bsdf"/"mesh"/...: row}
    #                  (drives SceneBundle.traverse(), the scene-wide
    #                   SceneParameters analogue of `util.py:13-331`)

    _SENSORS = ("perspective", "orthographic", "spherical", "thinlens",
                "distant", "radiancemeter", "irradiancemeter", "batch")
    for key, value in d.items():
        if key == "type" or not isinstance(value, dict):
            continue
        t = value.get("type")
        if t in ("path", "direct", "depth", "aov", "moment", "ptracer",
                 "prb", "prb_basic", "direct_projective", "prb_projective",
                 "volpath", "volpathmis", "prbvolpath"):
            integrator = value
        elif t == "stokes":
            # `stokes.cpp`: wraps a nested sampling integrator; depth/rr
            # settings come from the nested plugin
            nested = next((v for v in value.values()
                           if isinstance(v, dict) and "type" in v), {})
            integrator = dict(nested)
            integrator["type"] = "stokes"
        elif t in _SENSORS:
            sensor_desc = value
        elif t in ("sunsky", "constant", "envmap"):
            env_desc = value
        elif t in ("linearcurve", "bsplinecurve"):
            # curve shapes (`bsplinecurve.cpp`, `linearcurve.cpp`):
            # 'filename' in the reference's ASCII format, or inline
            # 'points' (P,3) + 'radii'/'radius'
            mat = _build_bsdf(value.get("bsdf", {"type": "diffuse"}), mode,
                              textures, materials)
            kind_c = "linear" if t == "linearcurve" else "bspline"
            if "filename" in value:
                from .curve import read_curve_file
                parsed = read_curve_file(value["filename"])
            else:
                pts = np.asarray(value["points"], np.float32)
                radii = value.get("radii")
                radii = (np.full((len(pts),),
                                 float(value.get("radius", 0.1)),
                                 np.float32) if radii is None
                         else np.asarray(radii, np.float32))
                parsed = [(pts, radii)]
            for pts_c, radii_c in parsed:
                curves.append(dict(
                    points=pts_c, radii=radii_c, kind=kind_c,
                    to_world=_parse_to_world(value.get("to_world")),
                    bsdf_idx=len(materials)))
            materials.append(mat)
        elif t in ("obj", "ply", "serialized"):
            if t == "obj":
                from ..utils.native import load_obj
                pos, nrm, idx, uvs = load_obj(value["filename"])
            elif t == "ply":
                from ..utils.meshio import read_ply
                pos, nrm, idx, uvs, vcols = read_ply(value["filename"])
            else:
                from ..utils.meshio import read_serialized
                pos, nrm, idx, uvs = read_serialized(
                    value["filename"],
                    shape_index=int(value.get("shape_index", 0)),
                    face_normals=bool(value.get("face_normals", False)))
            if value.get("face_normals"):
                nrm = np.zeros_like(pos)     # geometric normals at hit time
            mat = _build_bsdf(value.get("bsdf", {"type": "diffuse"}), mode,
                              textures, materials)
            param_map[key] = {"mesh": len(meshes), "bsdf": len(materials),
                              "mat": mat}
            meshes.append(dict(positions=pos, normals=nrm, indices=idx,
                               uvs=uvs,
                               colors=vcols if t == "ply" else None,
                               to_world=_parse_to_world(value.get("to_world")),
                               bsdf_idx=len(materials)))
            materials.append(mat)
        elif t == "point":
            point_lights.append(np.concatenate([
                np.asarray(value.get("position", [0, 0, 0]), np.float32),
                spectrum_to_channels(value.get("intensity", 1.0), "rgb")]))
            point_weights.append(float(value.get("sampling_weight", 1.0)))
        elif t == "directional":
            directional_lights.append(np.concatenate([
                np.asarray(value.get("direction", [0, 0, -1]), np.float32),
                spectrum_to_channels(value.get("irradiance", 1.0), "rgb")]))
            dir_weights.append(float(value.get("sampling_weight", 1.0)))
        elif t in ("spot", "projector"):
            from .emitters import make_spot
            spot_weights.append(float(value.get("sampling_weight", 1.0)))
            tex = value.get("texture")
            if isinstance(tex, dict):   # inline bitmap only
                tex = np.asarray(tex.get("bitmap"), np.float32)
            to_world = value.get("to_world")
            if to_world is not None:
                m = _parse_to_world(to_world)
                position = m[:3, 3]
                direction = m[:3, 2]
            else:
                position = value.get("position", [0, 0, 0])
                direction = value.get("direction", [0, 0, -1])
            if t == "projector":
                fov = float(value.get("fov", 45.0))
                spot_lights.append(make_spot(
                    position, direction,
                    spectrum_to_channels(value.get("irradiance", 1.0),
                                         "rgb"),
                    cutoff_angle_deg=fov / 2.0, beam_width_deg=fov / 2.0,
                    texture=tex))
            else:
                cutoff = float(value.get("cutoff_angle", 20.0))
                spot_lights.append(make_spot(
                    position, direction,
                    spectrum_to_channels(value.get("intensity", 1.0),
                                         "rgb"),
                    cutoff_angle_deg=cutoff,
                    beam_width_deg=float(value.get("beam_width",
                                                   cutoff * 0.75)),
                    texture=tex))
        elif t == "sdfgrid":
            # SDF grid shape (reference `sdfgrid.cpp`): values from an
            # inline array, a .npy file, or a Mitsuba .vol file
            if "interior" in value:
                raise ValueError("sdfgrid does not support interior media")
            if "grid" in value:
                vals = np.asarray(value["grid"], np.float32)
            elif "filename" in value:
                fn = value["filename"]
                if fn.endswith(".vol"):
                    from ..utils.io import read_vol
                    vals = read_vol(fn)[0][..., 0]
                else:
                    vals = np.load(fn).astype(np.float32)
            else:
                raise ValueError("sdfgrid needs 'grid' or 'filename'")
            bsdf_desc = value.get("bsdf", {"type": "diffuse"})
            sdf_mat = _build_bsdf(bsdf_desc, mode, textures, materials)
            from .sdf import make_sdf_grid
            if sdf_grid is not None:
                raise ValueError("only one sdfgrid per scene is supported")
            sdf_grid = make_sdf_grid(
                vals, to_world=_parse_to_world(value.get("to_world")),
                bsdf_idx=len(materials))
            materials.append(sdf_mat)
        elif t in _SHAPE_KINDS:
            if "interior" in value:
                # participating medium bound to this (convex) shape's
                # interior (reference: shape `interior` medium refs +
                # `homogeneous.cpp`). The boundary is index-matched (null
                # BSDF), so the shape is NOT added to the surface table —
                # the integrator clips ray segments against the region
                # analytically (render/medium.py).
                if t not in ("sphere", "cube"):
                    raise ValueError("interior media require a convex "
                                     "sphere/cube boundary, got " + t)
                idesc = value["interior"]
                mtype = idesc.get("type", "homogeneous")
                if mtype not in ("homogeneous", "heterogeneous"):
                    raise ValueError(f"unsupported medium type {mtype!r}")
                phase_kwargs = _parse_phase(
                    idesc.get("phase", {"type": "isotropic"}))
                def _num(x):   # unwrap XML {"type": "rgb", "value": [...]}
                    return x["value"] if isinstance(x, dict) else x

                def _volume(x):
                    """gridvolume (`grid.cpp`) / constvolume
                    (`const.cpp`): inline 'grid' ndarray or .vol file; ->
                    (scalar value or None, grid or None)."""
                    if not isinstance(x, dict) or x.get("type") in ("rgb",
                                                                    None):
                        return x if not isinstance(x, dict) \
                            else x.get("value"), None
                    if x.get("type") == "constvolume":
                        return x.get("value", 1.0), None
                    if x.get("type") != "gridvolume":
                        raise ValueError("expected gridvolume, got "
                                         f"{x.get('type')!r}")
                    if "grid" in x:
                        grid = np.asarray(x["grid"], np.float32)
                    else:
                        from ..utils.io import read_vol
                        grid = read_vol(x["filename"])[0]
                    if grid.ndim == 4:
                        grid = grid.mean(-1)
                    return None, grid
                density = None
                if mtype == "heterogeneous":
                    if t != "cube":
                        raise ValueError("heterogeneous media require a "
                                         "cube boundary (gridvolume bbox)")
                    sig_v, density = _volume(idesc.get("sigma_t", 1.0))
                    scale_m = float(idesc.get("scale", 1.0))
                    if density is None:   # constant sigma_t, still allowed
                        density = np.ones((2, 2, 2), np.float32)
                        sig = np.atleast_1d(np.asarray(sig_v, np.float32))
                    else:
                        sig = np.ones(1, np.float32)
                    sig = sig * scale_m
                else:
                    sig = np.atleast_1d(np.asarray(
                        _num(idesc.get("sigma_t", 1.0)), np.float32))
                alb = np.atleast_1d(np.asarray(
                    _num(idesc.get("albedo", 0.75)), np.float32))
                if mode == "spectral":
                    sig, alb = sig.mean(None)[None], alb.mean(None)[None]
                from .medium import make_medium
                media_list.append(make_medium(
                    sig, alb,
                    to_world=_parse_to_world(value.get("to_world")),
                    kind=t, density=density,
                    n_steps=int(idesc.get("n_steps", 64)),
                    channel_mis=bool(idesc.get("channel_mis", False)),
                    **phase_kwargs))
                param_map[key] = {"medium": len(media_list) - 1}
                continue
            bsdf_desc = value.get("bsdf", {"type": "diffuse"})
            mat = _build_bsdf(bsdf_desc, mode, textures, materials)
            emitter = value.get("emitter")
            is_dir_area = (emitter or {}).get("type") == "directionalarea"
            radiance = (spectrum_to_channels(emitter["radiance"], "rgb")
                        if emitter else np.zeros(3))
            to_world = _parse_to_world(value.get("to_world"))
            if t == "cylinder":
                # `cylinder.cpp` props: endpoints p0/p1 + radius compose
                # with to_world (canonical frame is z in [0,1], radius 1)
                p0 = np.asarray(value.get("p0", [0, 0, 0]), np.float64)
                p1 = np.asarray(value.get("p1", [0, 0, 1]), np.float64)
                r = float(value.get("radius", 1.0))
                axis = p1 - p0
                length = np.linalg.norm(axis)
                zl = axis / max(length, 1e-12)
                up = (np.array([0.0, 0.0, 1.0]) if abs(zl[2]) < 0.9
                      else np.array([1.0, 0.0, 0.0]))
                xl = np.cross(up, zl)
                xl /= np.linalg.norm(xl)
                yl = np.cross(zl, xl)
                frame = np.eye(4)
                frame[:3, 0] = xl * r
                frame[:3, 1] = yl * r
                frame[:3, 2] = zl * length
                frame[:3, 3] = p0
                to_world = to_world @ frame.astype(np.float32)
            param_map[key] = {"shape": len(shapes), "bsdf": len(materials),
                              "mat": mat,
                              "emitter": (len(areas) if emitter
                                          and not is_dir_area else None)}
            shapes.append(dict(kind=_SHAPE_KINDS[t],
                               to_world=to_world,
                               bsdf_idx=len(materials),
                               emitter_idx=(len(areas) if emitter
                                            and not is_dir_area else -1)))
            materials.append(mat)
            if is_dir_area:
                dir_areas[len(shapes) - 1] = radiance
            elif emitter:
                areas.append(radiance)
        elif t in ("diffuse", "conductor", "roughconductor", "dielectric",
                   "roughdielectric", "plastic", "null", "mask", "twosided",
                   "blendbsdf",
                   "box", "gaussian", "tent", "lanczos", "mitchell",
                   "catmullrom"):
            # standalone BSDF/rfilter declaration (XML `id=` + `<ref>`
            # pattern, `xml.cpp`): shapes hold resolved copies, nothing to do
            continue
        elif t in ("independent", "stratified", "multijitter",
                   "orthogonal", "ldsampler", "sobol", "orthogonal_array"):
            # top-level <sampler> outside the sensor (accepted by the
            # reference's XML parser, e.g. Shader_Dragon.xml)
            top_level_sampler = value
        elif t == "blender":
            # `blender.cpp` builds a Mesh from raw pointers into the
            # Blender process's memory — meaningful only inside the
            # Blender exporter; there is no TPU-side equivalent.
            raise NotImplementedError(
                "'blender' shapes reference in-process Blender memory; "
                "export the mesh to PLY/OBJ instead")
        else:
            custom = _PLUGIN_REGISTRY.get("any", {}).get(t)
            if custom is None:
                raise ValueError(f"unknown plugin type {t!r} (key {key!r})")
            custom(value)

    # ---- sensor + film + sampler ----
    sensor_desc = sensor_desc or {"type": "perspective"}
    film_desc = sensor_desc.get("film", {})
    h = int(film_desc.get("height", 256))
    w = int(film_desc.get("width", 256))
    rfilter = film_desc.get("rfilter", {}).get("type", "box") \
        if isinstance(film_desc.get("rfilter"), dict) else "box"
    rfilter = rfilter if rfilter in ("box", "gaussian", "tent",
                                     "mitchell", "lanczos",
                                     "catmullrom") else "box"
    # crop window (`hdrfilm.cpp:46`: crop_offset_x/y, crop_width/height)
    crop_offset = crop_size = None
    if "crop_width" in film_desc or "crop_height" in film_desc:
        cw = int(film_desc.get("crop_width", w))
        ch = int(film_desc.get("crop_height", h))
        cx = int(film_desc.get("crop_offset_x", 0))
        cy = int(film_desc.get("crop_offset_y", 0))
        if not (0 <= cx and cx + cw <= w and 0 <= cy and cy + ch <= h):
            raise ValueError("crop window exceeds the film")
        crop_offset, crop_size = (cx, cy), (cw, ch)
    if film_desc.get("type") == "specfilm":
        # spectral band film (`src/films/specfilm.cpp`): each channel
        # integrates one wavelength band, or carries a named/explicit
        # sensor response function (srf) weighting its band
        # SRF channels: an explicit `srfs` list, or (the reference's
        # convention, `spectral_render_test.py:178-227`) any named nested
        # spectrum dict (e.g. band_00: {type: regular, ...}) — one output
        # channel each, ordered by key name (`specfilm.cpp:152-161`)
        srf_descs = None
        if "srfs" in film_desc:
            srf_descs = list(film_desc["srfs"])
        else:
            named = [(k, v) for k, v in sorted(film_desc.items())
                     if isinstance(v, dict)
                     and v.get("type") in ("regular", "irregular")
                     and k != "rfilter"]
            if named:
                srf_descs = [v for _k, v in named]
        if srf_descs is not None:
            from .spectra import parse_srf
            srfs = tuple(parse_srf(s) for s in srf_descs)
            lo = min(s[0] for s in srfs)
            hi = max(s[1] for s in srfs)
            bands = tuple(lo + (hi - lo) * i / len(srfs)
                          for i in range(len(srfs) + 1))
            film = Film(h, w, len(srfs), rfilter, bands,
                        crop_offset, crop_size, srfs)
        else:
            if "bands" in film_desc:
                bands = tuple(float(b) for b in film_desc["bands"])
            else:
                nb = int(film_desc.get("n_bands", 4))
                lo = float(film_desc.get("lambda_min", 360.0))
                hi = float(film_desc.get("lambda_max", 720.0))
                bands = tuple(lo + (hi - lo) * i / nb for i in range(nb + 1))
            film = Film(h, w, len(bands) - 1, rfilter, bands,
                        crop_offset, crop_size)
    else:
        film = Film(h, w, 3, rfilter, None, crop_offset, crop_size)
    sampler_desc = sensor_desc.get("sampler", top_level_sampler or {})
    spp = int(sampler_desc.get("sample_count", 16))
    sampler_kind = {"independent": "independent",
                    "stratified": "stratified",
                    "multijitter": "multijitter",
                    "orthogonal": "orthogonal",
                    "ldsampler": "qmc",
                    "sobol": "qmc"}.get(sampler_desc.get("type",
                                                         "independent"),
                                        "independent")

    sensor = _build_sensor(sensor_desc, w, h)

    # ---- environment emitter ----
    env_kind, env_params, env_rot = None, None, None
    if env_desc is not None:
        # emitter-local -> world rotation (`<transform name="to_world">`
        # on the env emitter; e.g. the y-up Shader_Dragon.xml scene)
        if "to_world" in env_desc:
            env_rot = _parse_to_world(env_desc["to_world"])[:3, :3]
        if env_desc["type"] == "sunsky":
            env_kind = "sunsky"
            env_params = _sunsky_params_from_props(env_desc, mode)
        elif env_desc["type"] == "constant":
            env_kind = "constant"
            rad_prop = env_desc.get("radiance", 1.0)
            # a scalar / uniform-spectrum property is a FLAT spectrum
            # (reference float-property -> uniform.cpp semantics), not an
            # RGB color — spectral eval must not upsample it
            is_uniform = (isinstance(rad_prop, (int, float))
                          or (isinstance(rad_prop, dict)
                              and rad_prop.get("type") == "uniform"))
            cls = UniformEnv if is_uniform else ConstantEnv
            env_params = cls(jnp.asarray(
                spectrum_to_channels(rad_prop, "rgb"), jnp.float32))
        elif env_desc["type"] == "envmap":
            from ..utils.io import read_exr
            from .emitters import make_envmap
            env_kind = "constant"  # precomputed state, no re-derivation
            if "bitmap" in env_desc:
                bm = np.asarray(env_desc["bitmap"], np.float32)
            else:
                img, names = read_exr(env_desc["filename"])
                bm = img[..., ::-1] if names[:3] == ["B", "G", "R"] else img
            env_params = make_envmap(bm,
                                     float(env_desc.get("scale", 1.0)),
                                     spectral=(mode == "spectral"))
        else:
            raise ValueError(f"unsupported environment {env_desc['type']!r}")

    area_radiance = None
    if areas:
        area_radiance = np.zeros((max(len(shapes), 1), 3), np.float32)
        for s in shapes:
            if s["emitter_idx"] >= 0:
                area_radiance[shapes.index(s)] = areas[s["emitter_idx"]]

    if not materials:
        materials = [_build_bsdf({"type": "diffuse"}, mode)]
    measured_ds = None
    measured_files = {m.pop("measured_file") for m in materials
                      if "measured_file" in m}
    if measured_files:
        if len(measured_files) > 1:
            raise ValueError("only one measured BRDF dataset per scene is "
                             "supported")
        from ..ops.tensorfile import read_tensor_file
        from .measured import load_measured
        measured_ds = load_measured(read_tensor_file(measured_files.pop()))
    measured_pol_ds = None
    mp_specs = {m.pop("measured_pol_file") for m in materials
                if "measured_pol_file" in m}
    if mp_specs:
        if len(mp_specs) > 1:
            raise ValueError("only one measured_polarized dataset per "
                             "scene is supported")
        from ..ops.tensorfile import read_tensor_file
        from .measured import load_measured_polarized
        fn, a_s, wl = mp_specs.pop()
        measured_pol_ds = load_measured_polarized(read_tensor_file(fn),
                                                  a_s, wl)
    dir_area_radiance = None
    if dir_areas:
        dir_area_radiance = np.zeros((max(len(shapes), 1), 3), np.float32)
        for si, rad in dir_areas.items():
            dir_area_radiance[si] = rad
    scene_static = make_scene(
        shapes=shapes,
        bsdf_albedos=[m["rgb"] for m in materials],
        bsdf_twosided=[m["twosided"] for m in materials],
        bsdf_spectral_albedos=[m["spec"] for m in materials],
        bsdf_kinds=[m["kind"] for m in materials],
        bsdf_alphas=[m["alpha"] for m in materials],
        bsdf_etas=[m["eta"] for m in materials],
        bsdf_ks=[m["k"] for m in materials],
        bsdf_iors=[m["ior"] for m in materials],
        bsdf_opacities=[m["opacity"] for m in materials],
        bsdf_tex_indices=[m["tex_idx"] for m in materials],
        bsdf_normal_tex_indices=[m["normal_tex_idx"] for m in materials],
        bsdf_extras=[m["extra"] for m in materials],
        bsdf_blend_children=[(m.get("blend_a", 0), m.get("blend_b", 0))
                             for m in materials],
        bsdf_blend_weights=[m.get("blend_w", 0.0) for m in materials],
        measured=measured_ds,
        measured_pol=measured_pol_ds,
        env_to_world=env_rot,
        textures=textures or None,
        spectral_textures=(mode == "spectral"),
        area_radiance=area_radiance,
        point_lights=point_lights or None,
        directional_lights=directional_lights or None,
        spot_lights=tuple(spot_lights),
        delta_light_weights=(
            (point_weights + dir_weights + spot_weights)
            if (point_weights or dir_weights or spot_weights) else None),
        dir_area_radiance=dir_area_radiance,
        meshes=meshes or None,
        medium=(None if not media_list else media_list[0]
                if len(media_list) == 1 else tuple(media_list)),
        sdf=sdf_grid,
        curves=curves or None,
        env=None)

    itype = integrator.get("type", "path")
    # AD-integrator plugin names (prb/prb_basic/..., `ad/integrators/`) map
    # onto the same engine: the bounce loop is already a rematerialised
    # replay backward (see tpusky.ad.integrators).
    from ..ad.integrators import AD_INTEGRATOR_ALIASES
    forced_depth = None
    if itype in AD_INTEGRATOR_ALIASES:
        itype, forced_depth = AD_INTEGRATOR_ALIASES[itype]
    max_depth = int(integrator.get("max_depth", 2 if itype == "direct" else 6))
    if itype == "direct":
        max_depth = 2
    if forced_depth is not None:
        max_depth = forced_depth
    rr_depth = int(integrator.get("rr_depth", 5))

    return SceneBundle(sensor=sensor, film=film, integrator=itype,
                       max_depth=max_depth, rr_depth=rr_depth, spp=spp,
                       mode=mode, sampler_kind=sampler_kind,
                       env_kind=env_kind, env_params=env_params,
                       scene_desc=d, _scene_static=scene_static,
                       param_map=param_map)


def _sunsky_params_from_props(props: dict, mode: str):
    """Reference-compatible sunsky property parsing (`sunsky.cpp:889-948`)."""
    turbidity = float(props.get("turbidity", 3.0))
    if not 1.0 <= turbidity <= 10.0:
        raise ValueError(f"turbidity {turbidity} out of range [1, 10]")
    albedo = spectrum_to_channels(props.get("albedo", 0.3), mode)
    if np.any(albedo < 0) or np.any(albedo > 1):
        raise ValueError(f"albedo must be in [0, 1], got {albedo}")
    sun_scale = float(props.get("sun_scale", 1.0))
    sky_scale = float(props.get("sky_scale", 1.0))
    aperture = float(props.get("sun_aperture", skyC.SUN_APERTURE_DEG))

    time_keys = ("latitude", "longitude", "timezone", "year", "month", "day",
                 "hour", "minute", "second")
    if "sun_direction" in props:
        if any(k in props for k in time_keys):
            raise ValueError("give either sun_direction or time/location, "
                             "not both")
        sd = np.asarray(props["sun_direction"], np.float64)
        sd = sd / np.linalg.norm(sd)
    else:
        dt = DateTimeRecord(year=int(props.get("year", 2010)),
                            month=int(props.get("month", 7)),
                            day=int(props.get("day", 10)),
                            hour=float(props.get("hour", 15.0)),
                            minute=float(props.get("minute", 0.0)),
                            second=float(props.get("second", 0.0)))
        loc = LocationRecord(latitude=float(props.get("latitude", 35.6894)),
                             longitude=float(props.get("longitude",
                                                       139.6917)),
                             timezone=float(props.get("timezone", 9.0)))
        sd = astro_sun_direction(dt, loc)
    return sunsky_model.make_params(
        turbidity=turbidity, albedo=albedo, sun_direction=sd,
        sky_scale=sky_scale, sun_scale=sun_scale, sun_aperture_deg=aperture,
        mode=mode)
