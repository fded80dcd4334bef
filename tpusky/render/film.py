"""Film: deterministic sample accumulation and development.

TPU-first counterpart of the reference's `ImageBlock`/`hdrfilm`
(`src/render/imageblock.cpp:126-418`, `src/films/hdrfilm.cpp:135-330`):
instead of atomic scatter-adds (non-deterministic ordering), samples are
accumulated with `segment_sum` over pixel ids, which XLA lowers to a
deterministic sorted reduction — renders are bit-reproducible for a fixed
seed and mesh shape (SURVEY.md §5 "race detection").

Reconstruction filters: `box` (1 tap) and `gaussian` (stddev 0.5,
2x2 taps), matching the reference's defaults (`src/rfilters/`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Film(NamedTuple):
    height: int
    width: int
    n_channels: int
    rfilter: str = "box"       # "box" | "gaussian"


def splat(film: Film, pixel_uv, values):
    """Accumulate per-sample values into (H, W, C+1) [weighted sum, weight].

    pixel_uv: (N, 2) continuous film coords in pixels (x, y in [0, W]x[0, H]).
    values: (N, C).
    """
    h, w, c = film.height, film.width, film.n_channels
    values = jnp.concatenate([values, jnp.ones_like(values[..., :1])], -1)

    if film.rfilter == "box":
        px = jnp.clip(pixel_uv[..., 0].astype(jnp.int32), 0, w - 1)
        py = jnp.clip(pixel_uv[..., 1].astype(jnp.int32), 0, h - 1)
        flat = py * w + px
        img = jax.ops.segment_sum(values, flat, num_segments=h * w)
        return img.reshape(h, w, c + 1)

    # gaussian (sigma = 0.5, radius 1): 2x2 neighbourhood around the sample
    sigma2 = 0.25
    base_x = jnp.floor(pixel_uv[..., 0] - 0.5)
    base_y = jnp.floor(pixel_uv[..., 1] - 0.5)
    img = jnp.zeros((h * w, c + 1), values.dtype)
    for oy in (0, 1):
        for ox in (0, 1):
            px = base_x + ox
            py = base_y + oy
            dx = px + 0.5 - pixel_uv[..., 0]
            dy = py + 0.5 - pixel_uv[..., 1]
            wgt = jnp.exp(-0.5 * (dx * dx + dy * dy) / sigma2)
            inside = ((px >= 0) & (px < w) & (py >= 0) & (py < h))
            wgt = jnp.where(inside, wgt, 0.0)
            flat = (jnp.clip(py, 0, h - 1) * w
                    + jnp.clip(px, 0, w - 1)).astype(jnp.int32)
            img = img + jax.ops.segment_sum(values * wgt[..., None], flat,
                                            num_segments=h * w)
    return img.reshape(h, w, c + 1)


def develop(accum):
    """Weighted division -> (H, W, C) image."""
    weight = accum[..., -1:]
    return accum[..., :-1] / jnp.maximum(weight, 1e-12)
