"""Probe the config-5 CRN loss landscape directly.

Answers (on the chip, exact loss the train step uses):
  1. loss vs T with sun/albedo at truth  — is T's 1-D section clean?
  2. loss vs T with sun 3 deg off        — does sun error bias T's min?
  3. loss vs sun angle at T truth        — the capture radius per blur sigma

Usage: python tools/train_landscape.py [--sigma 16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sigma", type=float, default=16.0)
    ap.add_argument("--spp", type=int, default=8)
    a = ap.parse_args()

    import tpusky as ts
    from tpusky.models.sunsky import model as M
    from tpusky.models.sunsky.tables import load_tables
    from tpusky.render.film import Film
    from tpusky.render.sensors import make_perspective
    from tpusky.render import integrator, film as film_mod
    from tpusky.render.bsdf import table_kinds
    sys.path.insert(0, ".")
    from bench import _sphere_plane_scene

    h = w = 512
    spp = a.spp
    tables = load_tables("rgb")
    base_scene = _sphere_plane_scene()
    sensor = make_perspective([4, -4, 2.0], [0, 0, 1.0], fov_x_deg=45)
    film = Film(h, w, 3)
    kinds = table_kinds(base_scene.bsdfs)
    crn_key = jax.random.PRNGKey(123)

    sd_true = np.asarray([0.45, 0.30, 0.84])
    sd_true /= np.linalg.norm(sd_true)

    def render(p):
        sc = base_scene._replace(env=M.precompute(tables, p, "rgb"))
        return film_mod.develop(integrator.render_rows(
            sc, sensor, film, crn_key, spp, 2, 1000, "rgb", 0, h,
            kinds=kinds))

    render_j = jax.jit(render)
    true_p = ts.make_params(turbidity=6.5, albedo=0.3,
                            sun_direction=sd_true)
    target = jax.block_until_ready(render_j(true_p))

    sig = a.sigma

    @jax.jit
    def loss_of(img):
        li = jnp.log1p(jnp.maximum(img, 0.0))
        lt = jnp.log1p(jnp.maximum(target, 0.0))
        out = jnp.mean((li - lt) ** 2)
        r = jnp.arange(img.shape[0], dtype=jnp.float32)
        B = jnp.exp(-0.5 * ((r[:, None] - r[None, :]) / sig) ** 2)
        B = B / B.sum(axis=1, keepdims=True)
        blur = lambda x: jnp.einsum("ij,jwc->iwc", B,
                                    jnp.einsum("ij,hjc->hic", B, x))
        return out + 16.0 * jnp.mean((blur(li) - blur(lt)) ** 2)

    def sun_at(err_deg, azim=0.0):
        e = np.radians(err_deg)
        up = np.asarray([0.0, 0.0, 1.0])
        t1 = np.cross(sd_true, up); t1 /= np.linalg.norm(t1)
        t2 = np.cross(sd_true, t1)
        off = np.cos(np.radians(azim)) * t1 + np.sin(np.radians(azim)) * t2
        v = np.cos(e) * sd_true + np.sin(e) * off
        return v / np.linalg.norm(v)

    print(f"# sigma={sig} spp={spp}", flush=True)
    print("## loss vs T (sun/albedo at truth)", flush=True)
    for T in np.arange(5.0, 8.01, 0.25):
        p = ts.make_params(turbidity=float(T), albedo=0.3,
                           sun_direction=sd_true)
        print(f"T={T:5.2f} loss={float(loss_of(render_j(p))):.6e}",
              flush=True)
    print("## loss vs T (sun 3 deg off)", flush=True)
    sd3 = sun_at(3.0)
    for T in np.arange(5.0, 8.01, 0.25):
        p = ts.make_params(turbidity=float(T), albedo=0.3,
                           sun_direction=sd3)
        print(f"T={T:5.2f} loss={float(loss_of(render_j(p))):.6e}",
              flush=True)
    print("## loss vs sun error (T/albedo at truth)", flush=True)
    for e in [0.0, 0.25, 0.5, 1, 2, 3, 5, 8, 12, 18]:
        p = ts.make_params(turbidity=6.5, albedo=0.3,
                           sun_direction=sun_at(e))
        print(f"err={e:5.2f}deg loss={float(loss_of(render_j(p))):.6e}",
              flush=True)


if __name__ == "__main__":
    main()
