"""Chi-square goodness-of-fit harness for sampling routines.

Counterpart of the reference's `mi.chi2` module (`src/python/python/chi2.py`,
SURVEY.md §3.5): verifies that a `sample` routine and its claimed `pdf`
agree, by histogramming N samples over a spherical domain and comparing
against the pdf integrated per cell (Pearson chi-square with cell pooling).

Domain parameterisation: (phi in [-pi, pi], cos_theta in [cos_lo, cos_hi]);
the area element in these coordinates is constant, so the pdf integrand is
pdf(direction) alone (solid-angle measure).
"""

from __future__ import annotations

import numpy as np
from scipy.stats import chi2 as chi2_dist

import jax
import jax.numpy as jnp


def spherical_to_point(d):
    """direction (..., 3) -> (phi, cos_theta)."""
    return jnp.stack([jnp.arctan2(d[..., 1], d[..., 0]), d[..., 2]], axis=-1)


def chi2_test(sample_fn, pdf_fn, *, key, sample_count=4_000_000,
              res_phi=128, res_cos=64, cos_range=(-1.0, 1.0), ires=8,
              batch=1_000_000, significance=0.01, device_hist=False):
    """Run the chi-square test.

    sample_fn(key, n) -> directions (n, 3); pdf_fn(directions) -> (n,)
    solid-angle pdf. Returns (p_value, passed, info dict).
    Mirrors the reference's histogram/integration/pooling scheme
    (`chi2.py:100-239`: trapezoid pdf integration at `ires` sub-resolution,
    pooling of cells with expected < 5, Sidak-less single test).

    device_hist=True bins each batch on the accelerator (jnp.bincount
    scatter-add) and transfers only the (res_cos, res_phi) counts — the
    path that makes reference-scale runs (N=1e8, res 215; reference
    `test_sunsky.py:256-263`) practical on a tunnelled TPU where pulling
    1e8 sample triplets to the host would dominate.
    """
    cos_lo, cos_hi = cos_range

    # ---- histogram of samples (batched to bound memory) ----
    if device_hist:
        n_cells = res_cos * res_phi

        @jax.jit
        def hist_batch(k, counts):
            d = sample_fn(k, batch)
            phi = jnp.arctan2(d[:, 1], d[:, 0])
            ct = d[:, 2]
            ix = jnp.clip(((phi + jnp.pi) / (2 * jnp.pi)
                           * res_phi).astype(jnp.int32), 0, res_phi - 1)
            iy = jnp.clip(((ct - cos_lo) / (cos_hi - cos_lo)
                           * res_cos).astype(jnp.int32), 0, res_cos - 1)
            flat = iy * res_phi + ix
            flat = jnp.where((ct >= cos_lo) & (ct <= cos_hi),
                             flat, n_cells)           # overflow bin
            return counts + jnp.bincount(flat, length=n_cells + 1)

        assert sample_count % batch == 0, "device_hist needs batch | N"
        counts = jnp.zeros((n_cells + 1,), jnp.int64 if
                           jax.config.jax_enable_x64 else jnp.int32)
        for bi in range(sample_count // batch):
            counts = hist_batch(jax.random.fold_in(key, bi), counts)
        counts = np.asarray(jax.block_until_ready(counts), np.int64)
        hist = counts[:n_cells].reshape(res_cos, res_phi)
    else:
        hist = np.zeros((res_cos, res_phi), np.int64)
        n_done = 0
        bi = 0
        while n_done < sample_count:
            n = min(batch, sample_count - n_done)
            d = np.asarray(sample_fn(jax.random.fold_in(key, bi), n))
            phi = np.arctan2(d[:, 1], d[:, 0])
            ct = d[:, 2]
            ix = np.clip(((phi + np.pi) / (2 * np.pi)
                          * res_phi).astype(np.int64), 0, res_phi - 1)
            iy = np.clip(((ct - cos_lo) / (cos_hi - cos_lo) * res_cos)
                         .astype(np.int64), 0, res_cos - 1)
            inside = (ct >= cos_lo) & (ct <= cos_hi)
            np.add.at(hist, (iy[inside], ix[inside]), 1)
            n_done += n
            bi += 1
    n_outside = sample_count - hist.sum()

    # ---- integrate the pdf per cell (midpoint rule at sub-resolution).
    # Midpoint avoids evaluating on the domain boundary, where the
    # solid-angle pdf has a 1/sin(theta) spike near the (cropped) pole
    # that would wreck a trapezoid estimate. ----
    n_sub_p = res_phi * ires
    n_sub_c = res_cos * ires
    dphi = 2 * np.pi / n_sub_p
    dcos = (cos_hi - cos_lo) / n_sub_c
    phi_mid = -np.pi + (np.arange(n_sub_p) + 0.5) * dphi

    if device_hist:
        # integrate on-device: only the (rc, res_phi) cell sums come back
        # per chunk (at ires>=32 the host path would ship GBs of
        # direction triplets over a tunnelled link)
        rc = next(c for c in range(8, 0, -1) if res_cos % c == 0)
        phi_j = jnp.asarray(phi_mid, jnp.float32)

        @jax.jit
        def exp_rows(row0):
            sub = row0 * ires + jnp.arange(rc * ires)
            cg = (cos_lo + (sub + 0.5) * dcos)[:, None]
            st = jnp.sqrt(jnp.clip(1.0 - cg * cg, 0.0, None))
            dirs = jnp.stack(
                [jnp.cos(phi_j)[None, :] * st,
                 jnp.sin(phi_j)[None, :] * st,
                 jnp.broadcast_to(cg, (rc * ires, n_sub_p))], -1)
            pv = pdf_fn(dirs.reshape(-1, 3)).reshape(rc, ires,
                                                     res_phi, ires)
            return jnp.sum(pv, axis=(1, 3), dtype=jnp.float32) \
                * (dphi * dcos)

        expected = np.concatenate(
            [np.asarray(exp_rows(r0), np.float64)
             for r0 in range(0, res_cos, rc)], axis=0)
    else:
        cos_mid = cos_lo + (np.arange(n_sub_c) + 0.5) * dcos
        pg, cg = np.meshgrid(phi_mid, cos_mid)
        st = np.sqrt(np.maximum(1.0 - cg ** 2, 0.0))
        dirs = np.stack([np.cos(pg) * st, np.sin(pg) * st, cg], -1)
        pdf_vals = np.zeros(pg.shape, np.float64)
        rows_per_chunk = max(1, (1 << 22) // pg.shape[1])
        for r0 in range(0, pg.shape[0], rows_per_chunk):
            r1 = min(r0 + rows_per_chunk, pg.shape[0])
            pdf_vals[r0:r1] = np.asarray(
                pdf_fn(jnp.asarray(dirs[r0:r1].reshape(-1, 3),
                                   jnp.float32))).reshape(r1 - r0, -1)
        cell_int = pdf_vals * (dphi * dcos)
        expected = cell_int.reshape(res_cos, ires, res_phi,
                                    ires).sum((1, 3))
    expected = expected * sample_count

    # ---- pooled Pearson chi-square (cells with expected < 5 merged) ----
    obs = hist.ravel().astype(np.float64)
    exp = expected.ravel()
    order = np.argsort(exp)
    obs, exp = obs[order], exp[order]
    pooled_obs, pooled_exp = [], []
    acc_o = acc_e = 0.0
    for o, e in zip(obs, exp):
        acc_o += o
        acc_e += e
        if acc_e >= 5.0:
            pooled_obs.append(acc_o)
            pooled_exp.append(acc_e)
            acc_o = acc_e = 0.0
    if acc_e > 0:
        if pooled_exp:
            pooled_obs[-1] += acc_o
            pooled_exp[-1] += acc_e
        else:
            pooled_obs, pooled_exp = [acc_o], [acc_e]
    pooled_obs = np.asarray(pooled_obs)
    pooled_exp = np.asarray(pooled_exp)

    total_exp = pooled_exp.sum() + 0.0
    miss_frac = n_outside / sample_count
    stat = float(np.sum((pooled_obs - pooled_exp) ** 2 / pooled_exp))
    dof = len(pooled_exp) - 1
    p_value = float(chi2_dist.sf(stat, dof))
    info = dict(stat=stat, dof=dof, cells=len(pooled_exp),
                integral=total_exp / sample_count, miss_frac=miss_frac)
    return p_value, p_value >= significance, info


def chi2_test_2d(sample_fn, pdf_fn, *, key, sample_count=2_000_000,
                 res_x=64, res_y=64, ires=8, batch=1_000_000,
                 significance=0.01):
    """Chi-square test for distributions over the unit square [0,1]^2
    (the reference's PlanarDomain path, `chi2.py:411-430`): sample_fn(key,
    n) -> (n, 2) points, pdf_fn(xy) -> (n,) density. Returns
    (p_value, passed, info)."""
    hist = np.zeros((res_y, res_x), np.int64)
    n_done, bi = 0, 0
    while n_done < sample_count:
        n = min(batch, sample_count - n_done)
        p = np.asarray(sample_fn(jax.random.fold_in(key, bi), n))
        ix = np.clip((p[:, 0] * res_x).astype(np.int64), 0, res_x - 1)
        iy = np.clip((p[:, 1] * res_y).astype(np.int64), 0, res_y - 1)
        np.add.at(hist, (iy, ix), 1)
        n_done += n
        bi += 1

    # integrate pdf per cell at sub-resolution (midpoint rule)
    fx = (np.arange(res_x * ires) + 0.5) / (res_x * ires)
    fy = (np.arange(res_y * ires) + 0.5) / (res_y * ires)
    gx, gy = np.meshgrid(fx, fy)
    pts = jnp.asarray(np.stack([gx.ravel(), gy.ravel()], -1), jnp.float32)
    dens = np.asarray(pdf_fn(pts)).reshape(res_y * ires, res_x * ires)
    cell = dens.reshape(res_y, ires, res_x, ires).mean(axis=(1, 3))
    expected = cell * (1.0 / (res_x * res_y)) * sample_count

    # pool cells with tiny expectation (reference pools expected < 5)
    obs = hist.ravel().astype(np.float64)
    exp = expected.ravel()
    order = np.argsort(exp)
    obs, exp = obs[order], exp[order]
    pooled_o, pooled_e, o_acc, e_acc = [], [], 0.0, 0.0
    for o, e in zip(obs, exp):
        o_acc += o; e_acc += e
        if e_acc >= 5.0:
            pooled_o.append(o_acc); pooled_e.append(e_acc)
            o_acc = e_acc = 0.0
    if e_acc > 0:
        if pooled_e:
            pooled_o[-1] += o_acc; pooled_e[-1] += e_acc
        else:
            pooled_o.append(o_acc); pooled_e.append(e_acc)
    pooled_o = np.asarray(pooled_o); pooled_e = np.asarray(pooled_e)
    stat = np.sum((pooled_o - pooled_e) ** 2 / np.maximum(pooled_e, 1e-9))
    dof = len(pooled_e) - 1
    p_value = float(chi2_dist.sf(stat, max(dof, 1)))
    return p_value, p_value >= significance, dict(stat=float(stat), dof=dof)


class EmitterAdapter:
    """`mi.chi2.EmitterAdapter` (`chi2.py:530`) counterpart: wraps an
    environment emitter's (sample_direction, pdf_direction) pair for
    `chi2_test`. `env` is any environment state accepted by
    tpusky.render.emitters."""

    def __init__(self, env, env_to_world=None):
        from ..render import emitters as em
        self._em = em
        self.env = env
        self.env_to_world = (jnp.eye(3) if env_to_world is None
                             else jnp.asarray(env_to_world, jnp.float32))

    def sample(self, key, n):
        u = jax.random.uniform(key, (n, 2))
        d, _, _ = self._em.env_sample_eval(self.env, self.env_to_world, u)
        return d

    def pdf(self, d):
        return self._em.env_pdf_direction(self.env, self.env_to_world, d)

    def run(self, key=None, **kw):
        return chi2_test(self.sample, self.pdf,
                         key=key or jax.random.PRNGKey(0), **kw)


class BSDFAdapter:
    """`mi.chi2.BSDFAdapter` (`chi2.py:477`) counterpart: fixes wi and
    wraps a material's (sample, pdf) for `chi2_test`."""

    def __init__(self, bsdfs, mat_idx, wi, kinds=None):
        from ..render import bsdf as bsdf_mod
        self._bsdf = bsdf_mod
        self.bsdfs = bsdfs
        self.mat_idx = int(mat_idx)
        self.wi = jnp.asarray(wi, jnp.float32)
        self.kinds = kinds or bsdf_mod.table_kinds(bsdfs)

    def sample(self, key, n):
        u2 = jax.random.uniform(key, (n, 2))
        u1 = jax.random.uniform(jax.random.fold_in(key, 7), (n,))
        wi = jnp.broadcast_to(self.wi, (n, 3))
        idx = jnp.full((n,), self.mat_idx, jnp.int32)
        wo, _, _, _ = self._bsdf.sample(self.bsdfs, idx, wi, u2, u1, None,
                                        kinds=self.kinds)
        return wo

    def pdf(self, wo):
        n = wo.shape[0]
        wi = jnp.broadcast_to(self.wi, (n, 3))
        idx = jnp.full((n,), self.mat_idx, jnp.int32)
        _, pdf = self._bsdf.eval_pdf(self.bsdfs, idx, wi, wo, None,
                                     kinds=self.kinds)
        return pdf

    def run(self, key=None, cos_range=(0.0, 1.0), **kw):
        return chi2_test(self.sample, self.pdf,
                         key=key or jax.random.PRNGKey(0),
                         cos_range=cos_range, **kw)
