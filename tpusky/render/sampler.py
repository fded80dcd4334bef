"""Samplers: per-lane low-discrepancy / stratified / independent streams.

Counterpart of the reference's sampler plugins (SURVEY.md H10;
`src/samplers/`). All samplers are counter-based and keyed on (pixel,
sample index, dimension), so streams are deterministic and independent of
device layout or chunking — the property the reference gets from
per-wavefront PCG32 seeding (`independent.cpp:68`).

Kinds:
  independent   counter-hash uniforms per (pixel, sample, dim) — two
                avalanche rounds of an xxhash-style mixer, ~6 integer ops
                per number (the reference's PCG32 is the same class of
                generator; threefry costs ~10x more and adds nothing for
                Monte Carlo rendering)
  threefry      the original jax.random streams (crypto-grade, for
                reproducibility experiments)
  stratified    jittered strata over the spp samples of each pixel, with a
                per-(pixel, dim) Cranley-Patterson rotation
  qmc           scrambled (0,2)-sequence (Sobol in base 2) per pixel with
                per-(pixel, dim) random digit scrambling — the analogue of
                the reference's `ldsampler`
  multijitter   correlated multi-jittered 2D pairs (Kensler, Pixar memo
                13-01 — the scheme behind the reference's
                `multijitter.cpp`): samples are simultaneously stratified
                on the spp x spp fine grid AND the m x n coarse grid;
                channels beyond each (2i, 2i+1) pair fall back to 1D
                strata. Requires power-of-two spp (else = stratified).
  orthogonal    Bose orthogonal array OA(p^2, strength 2) for prime p
                (Jarosz et al. 2019; the reference's `orthogonal.cpp`):
                ANY two dimensions are jointly stratified on a p x p grid,
                not just consecutive pairs; 1D projections are full
                Latin-hypercube. Requires spp == p^2 (else = stratified).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _hash_u32(x):
    """Cheap integer hash (xxhash-style avalanche) on uint32 arrays."""
    x = jnp.asarray(x, jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _u32_to_unit(x):
    return (x >> 8).astype(jnp.float32) * (1.0 / (1 << 24))


def _kensler_permute_pow2(i, l: int, p):
    """Pseudorandom bijection on [0, l) for power-of-two l, keyed by p."""
    w = jnp.uint32(l - 1)
    i = jnp.asarray(i, jnp.uint32)
    p = jnp.asarray(p, jnp.uint32)
    i = i ^ p
    i = i * jnp.uint32(0xE170893D)
    i = i ^ (p >> 16)
    i = i ^ ((i & w) >> 4)
    i = i ^ (p >> 8)
    i = i * jnp.uint32(0x0929EB3F)
    i = i ^ (p >> 23)
    i = i ^ ((i & w) >> 1)
    i = i * (jnp.uint32(1) | (p >> 27))
    i = i * jnp.uint32(0x6935FA69)
    i = i ^ ((i & w) >> 11)
    i = i * jnp.uint32(0x74DCCA23)
    i = i ^ (p >> 2)
    i = i * jnp.uint32(0x9E501CC3)
    i = i ^ ((i & w) >> 2)
    i = i * jnp.uint32(0xC860A3DF)
    i = i & w
    i = i ^ (i >> 5)
    return (i + p) & w


def _sobol_2d(index):
    """First two components of the base-2 (0,2)-sequence.

    Component 0 is the Van der Corput radical inverse (bit reversal);
    component 1 uses the standard Sobol' direction numbers.
    """
    idx = jnp.asarray(index, jnp.uint32)
    # bit-reverse for dimension 0
    v = idx
    v = ((v >> 1) & jnp.uint32(0x55555555)) | ((v & jnp.uint32(0x55555555)) << 1)
    v = ((v >> 2) & jnp.uint32(0x33333333)) | ((v & jnp.uint32(0x33333333)) << 2)
    v = ((v >> 4) & jnp.uint32(0x0F0F0F0F)) | ((v & jnp.uint32(0x0F0F0F0F)) << 4)
    v = ((v >> 8) & jnp.uint32(0x00FF00FF)) | ((v & jnp.uint32(0x00FF00FF)) << 8)
    d0 = (v >> 16) | (v << 16)

    # Sobol' dimension 1 via its direction numbers (classic bit trick)
    result = jnp.zeros_like(idx)
    direction = jnp.uint32(1 << 31)
    i = idx

    def body(carry, _):
        result, direction, i = carry
        result = jnp.where((i & 1) != 0, result ^ direction, result)
        direction = direction ^ (direction >> 1)
        i = i >> 1
        return (result, direction, i), None

    (result, _, _), _ = jax.lax.scan(body, (result, direction, i), None,
                                     length=32)
    return d0, result


def lane_samples(kind: str, key, pixel_idx, sample_idx, spp: int, dim: int,
                 n: int):
    """n uniform samples for each lane -> (..., n).

    pixel_idx, sample_idx: uint32 arrays identifying the lane. `dim` is a
    static per-use-site stream id. Internally each (dim, channel) pair
    maps to stream `dim * 64 + channel` — injective for n <= 64, so
    adjacent dims can never alias channels of one another (a stride-2
    scheme made `next(d, 3)[..., 2]` bitwise equal to `next(d+1, 2)[..., 0]`,
    correlating free-flight and NEE draws for 3+ media regions).
    """
    if n > 64:
        raise ValueError("lane_samples supports at most 64 channels per dim")
    if kind == "threefry":
        lane = pixel_idx * jnp.uint32(max(spp, 1)) + sample_idx
        keys = jax.vmap(lambda i: jax.random.fold_in(
            jax.random.fold_in(key, i), dim))(lane)
        return jax.vmap(lambda k: jax.random.uniform(k, (n,)))(keys)

    seed = jax.random.key_data(key)[-1].astype(jnp.uint32)

    if kind == "independent":
        lane = pixel_idx * jnp.uint32(max(spp, 1)) + sample_idx
        out = []
        for c in range(n):
            # three avalanche rounds with multiplicative stream separation;
            # two rounds left measurable correlations in light-sampling
            # estimators (seen as ~2x bias-noise vs threefry)
            h = _hash_u32(lane * jnp.uint32(0x85EBCA6B)
                          + jnp.uint32(dim * 64 + c) * jnp.uint32(0xC2B2AE35)
                          + seed)
            h = _hash_u32(h ^ (lane + jnp.uint32(0x9E3779B9)))
            out.append(_u32_to_unit(_hash_u32(h + jnp.uint32(dim * 64 + c))))
        return jnp.stack(out, axis=-1)

    if kind == "multijitter":
        pow2 = spp > 0 and (spp & (spp - 1)) == 0
        if not pow2 or spp < 4:
            kind = "stratified"     # CMJ grid needs power-of-two spp
        else:
            k = spp.bit_length() - 1
            m = 1 << ((k + 1) // 2)
            n_g = 1 << (k // 2)                       # m * n_g == spp
            out = []
            for c0 in range(0, n, 2):
                h = _hash_u32(pixel_idx ^ _hash_u32(
                    jnp.uint32(dim * 64 + c0) ^ seed))
                # outer shuffle decorrelates the pair across dimensions
                s = _kensler_permute_pow2(sample_idx, spp,
                                          h * jnp.uint32(0x51633E2D))
                sx = _kensler_permute_pow2(s % jnp.uint32(m), m,
                                           h * jnp.uint32(0xA511E9B3))
                sy = _kensler_permute_pow2(s // jnp.uint32(m), n_g,
                                           h * jnp.uint32(0x63D83595))
                jx = _u32_to_unit(_hash_u32(s ^ (h * jnp.uint32(0xA399D265))))
                jy = _u32_to_unit(_hash_u32(s ^ (h * jnp.uint32(0x711AD6A5))))
                x = ((s % jnp.uint32(m)).astype(jnp.float32)
                     + (sy.astype(jnp.float32) + jx) / n_g) / m
                out.append(x)
                if c0 + 1 < n:
                    y = ((s // jnp.uint32(m)).astype(jnp.float32)
                         + (sx.astype(jnp.float32) + jy) / m) / n_g
                    out.append(y)
            return jnp.stack(out, axis=-1)

    if kind == "stratified":
        pow2 = spp > 0 and (spp & (spp - 1)) == 0
        out = []
        for c in range(n):
            h = _hash_u32(pixel_idx ^ _hash_u32(
                jnp.uint32(dim * 64 + c) ^ seed))
            jitter = _u32_to_unit(_hash_u32(
                h ^ _hash_u32(sample_idx + jnp.uint32(0x9E3779B9))))
            if pow2:
                # Kensler's hash-based permutation ("Correlated
                # Multi-Jittered Sampling", Pixar tech memo 13-01): a
                # high-quality pseudorandom bijection on [0, 2^k) — unlike
                # XOR/affine masks, permutations for different dims are
                # effectively independent, which Latin-hypercube pairing
                # needs. Single pass (no cycle walking) for power-of-2 spp.
                perm = _kensler_permute_pow2(sample_idx, spp, h)
            else:
                perm = sample_idx % jnp.uint32(max(spp, 1))
            u = (perm.astype(jnp.float32) + jitter) / max(spp, 1)
            # Cranley-Patterson rotation decorrelates dimensions
            rot = _u32_to_unit(h)
            out.append(jnp.mod(u + rot, 1.0))
        return jnp.stack(out, axis=-1)

    if kind == "orthogonal":
        # Orthogonal-array sampler (reference `orthogonal.cpp`; Jarosz et
        # al. 2019 "Orthogonal Array Sampling"): Bose construction of an
        # OA(p^2, strength 2) for prime p — point s = (a, b) lands in
        # stratum phi_j = (a + k_j b) mod p for dimension j, so ANY two
        # dimensions with different multipliers k form a p x p grid with
        # exactly one point per cell. 1D projections are additionally
        # sub-stratified by b (a bijection within each phi column), giving
        # full spp-strata Latin-hypercube projections.
        p = int(round(spp ** 0.5))
        is_prime = p >= 2 and all(p % q for q in range(2, int(p ** 0.5) + 1))
        if p * p != spp or not is_prime:
            # Bose needs spp == prime^2 (the stratified branch is above
            # this one, so delegate explicitly)
            return lane_samples("stratified", key, pixel_idx, sample_idx,
                                spp, dim, n)
        else:
            a = sample_idx // jnp.uint32(p)
            b = sample_idx % jnp.uint32(p)
            out = []
            for c in range(n):
                j = dim * 64 + c
                h = _hash_u32(pixel_idx ^ _hash_u32(jnp.uint32(j) ^ seed))
                k_j = jnp.uint32(1 + (j % max(p - 1, 1)))
                phi = (a + k_j * b) % jnp.uint32(p)
                # per-pixel random digit shifts decorrelate pixels; jitter
                # fills the sub-stratum
                shift = _hash_u32(h + jnp.uint32(0x9E3779B9)) % jnp.uint32(p)
                col = (phi + shift) % jnp.uint32(p)
                sub = (b + _hash_u32(h ^ jnp.uint32(0x85EBCA6B))
                       % jnp.uint32(p)) % jnp.uint32(p)
                jit = _u32_to_unit(_hash_u32(
                    h ^ _hash_u32(sample_idx + jnp.uint32(j))))
                u = (col.astype(jnp.float32)
                     + (sub.astype(jnp.float32) + jit) / p) / p
                out.append(u)
            return jnp.stack(out, axis=-1)

    if kind == "qmc":
        d0, d1 = _sobol_2d(sample_idx)
        out = []
        for c in range(n):
            h = _hash_u32(pixel_idx ^ _hash_u32(
                jnp.uint32(dim * 64 + c) ^ seed))
            bits = d0 if c % 2 == 0 else d1
            scrambled = bits ^ h  # Owen-style digit scramble (XOR variant)
            out.append(_u32_to_unit(scrambled))
        return jnp.stack(out, axis=-1)

    raise ValueError(f"unknown sampler {kind!r}")


VALID_KINDS = ("independent", "threefry", "stratified", "qmc",
               "multijitter", "orthogonal")
