"""TPU-friendly replacements for small-table gathers.

On TPU, XLA lowers `table[idx]` gathers to slow scalar loops and pads
rank>=3 results catastrophically (measured on v5e: a (N,) gather from a
(45, 72) table costs 4.4x more than an MXU one-hot matmul; a (N,4,4)
gather from two matrices costs 26x more than a masked sum). These helpers
route per-lane lookups from small static tables through the MXU / VPU
instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def take_rows(table, idx):
    """table (K, F) float, idx (...,) int -> (..., F) via one-hot matmul.

    Equivalent to `table[idx]` but lowered as an MXU contraction. K must
    be small-ish (the one-hot is materialised as (..., K)).

    precision=HIGHEST is load-bearing: the TPU MXU's default precision
    truncates the multiplicands to bf16, i.e. the *gathered values* would
    silently round to 8 mantissa bits (measured: 1.8e-3 rad mean
    displacement of TGMM-sampled directions vs CPU, enough to fail the
    reference-scale sampling chi^2 at N=1e8)."""
    k = table.shape[0]
    onehot = (idx[..., None] == jnp.arange(k)).astype(table.dtype)
    return jnp.einsum("...k,kf->...f", onehot, table,
                      precision=jax.lax.Precision.HIGHEST)


def take_scalars(table, idx):
    """table (K,) float, idx (...,) -> (...,)."""
    return take_rows(table[:, None], idx)[..., 0]


def take_ints(table, idx):
    """Integer variant (values must be exactly representable in f32)."""
    out = take_scalars(table.astype(jnp.float32), idx)
    return jnp.round(out).astype(table.dtype)
