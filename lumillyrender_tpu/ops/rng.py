"""Counter-based per-lane RNG.

TPU-native replacement for the reference's global thread-local
`rand::random::<f32>()` (`util.rs`, `scene.rs`, `camera.rs` et al.): every
lane derives an independent stream from (seed, lane, bounce, purpose)
counters, so renders are deterministic, resumable (sample index is part of
the lane id) and host-count-invariant. Exact RNG-sequence parity with the
reference is impossible by construction (SURVEY.md §2.1 sampling row);
matching is statistical.

Mixer: **pcg4d** (Jarzynski & Olano, "Hash Functions for GPU Rendering",
JCGT 2020 — the published best-quality grid-input hash for rendering
workloads). One evaluation yields FOUR independent 32-bit words from the
(lane, ctr, seed, salt) counter vector for ~30 int ops — an order of
magnitude cheaper than a threefry2x32 block (20 rounds + key schedule per
2 words). That matters because RNG runs on EVERY lane of EVERY bounce
(dead lanes included — XLA computes the full wavefront and masks): at the
flagship wavefront the threefry budget measured as large as the entire
intersection stage (tools/roofline_achieved.py). Threefry2x32 is kept
below as a reference mixer (LLR_RNG=threefry) for A/B statistical checks.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

_MIXER = os.environ.get("LLR_RNG", "pcg4d")

_ROT = (13, 15, 26, 6, 17, 29, 16, 24)

# Plain Python float, NOT jnp.float32: a module-scope jnp constant would
# initialize the XLA backend at import time, which breaks
# jax.distributed.initialize() in multi-host processes (it must run before
# any JAX computation). Weak typing keeps the product float32.
_U24 = 1.0 / (1 << 24)


def _rotl(x, r):
    return (x << r) | (x >> (32 - r))


def threefry2x32(k0, k1, x0, x1, rounds: int = 20):
    """Threefry-2x32 block cipher over uint32 arrays (public algorithm,
    same family as jax.random's default PRNG). Reference mixer."""
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    x0 = jnp.asarray(x0, jnp.uint32)
    x1 = jnp.asarray(x1, jnp.uint32)
    ks2 = k0 ^ k1 ^ jnp.uint32(0x1BD11BDA)
    ks = (k0, k1, ks2)
    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    for i in range(rounds):
        x0 = x0 + x1
        x1 = _rotl(x1, _ROT[i % 8])
        x1 = x1 ^ x0
        if i % 4 == 3:
            j = i // 4 + 1
            x0 = x0 + ks[j % 3]
            x1 = x1 + ks[(j + 1) % 3] + jnp.uint32(j)
    return x0, x1


def pcg4d(a, b, c, d):
    """pcg4d mixer: 4 uint32 in -> 4 decorrelated uint32 out.

    Exactly the published construction (Jarzynski & Olano 2020, listing
    pcg4d): an LCG step per component, then the cross-component PCG
    permutation applied twice around an xorshift."""
    v = [jnp.asarray(x, jnp.uint32) for x in (a, b, c, d)]
    m, inc = jnp.uint32(1664525), jnp.uint32(1013904223)
    v = [x * m + inc for x in v]
    v[0] = v[0] + v[1] * v[3]
    v[1] = v[1] + v[2] * v[0]
    v[2] = v[2] + v[0] * v[1]
    v[3] = v[3] + v[1] * v[2]
    v = [x ^ (x >> 16) for x in v]
    v[0] = v[0] + v[1] * v[3]
    v[1] = v[1] + v[2] * v[0]
    v[2] = v[2] + v[0] * v[1]
    v[3] = v[3] + v[1] * v[2]
    return v[0], v[1], v[2], v[3]


def _seed_u32(seed):
    # The key schedule must be identical whether `seed` is a Python int or a
    # traced scalar — renders must not depend on jit boundaries.
    if isinstance(seed, int):
        return jnp.uint32(seed & 0xFFFFFFFF)
    return jnp.asarray(seed).astype(jnp.uint32)


def _to_f32(x):
    # 24 high bits -> [0, 1) float32 (same construction as jax.random.uniform)
    return (x >> 8).astype(jnp.float32) * _U24


def uniform4(seed, lane, ctr):
    """Four independent U[0,1) float32 per lane from ONE mixer evaluation.

    seed: python int or scalar; lane: uint32 array of lane ids; ctr: python
    int OR traced int32/uint32 scalar counter (bounce*K + purpose) — the
    bounce loop passes a traced value, so it is normalized to uint32 once
    here (a raw `ctr ^ 0x80000000` on a traced int32 would overflow).
    """
    s = _seed_u32(seed)
    lane = jnp.asarray(lane, jnp.uint32)
    c = jnp.asarray(ctr, jnp.uint32)
    if _MIXER == "threefry":
        s2 = s ^ jnp.uint32(0x9E3779B9)
        x0, x1 = threefry2x32(s, s2, lane, c)
        x2, x3 = threefry2x32(s, s2, lane, c ^ jnp.uint32(0x80000000))
    else:
        x0, x1, x2, x3 = pcg4d(lane, c, s, jnp.uint32(0xB5297A4D))
    return _to_f32(x0), _to_f32(x1), _to_f32(x2), _to_f32(x3)


def uniform2(seed, lane, ctr):
    """Two independent U[0,1) float32 per lane."""
    if _MIXER == "threefry":
        s = _seed_u32(seed)
        s2 = s ^ jnp.uint32(0x9E3779B9)
        x0, x1 = threefry2x32(s, s2, jnp.asarray(lane, jnp.uint32),
                              jnp.asarray(ctr, jnp.uint32))
        return _to_f32(x0), _to_f32(x1)
    f0, f1, _, _ = uniform4(seed, lane, ctr)
    return f0, f1


def uniform(seed, lane, ctr):
    return uniform2(seed, lane, ctr)[0]
