"""Counter-based per-lane RNG.

TPU-native replacement for the reference's global thread-local
`rand::random::<f32>()` (`util.rs`, `scene.rs`, `camera.rs` et al.): every
lane derives an independent stream from (seed, lane, bounce, purpose)
counters, so renders are deterministic, resumable (sample index is part of
the lane id) and host-count-invariant. Exact RNG-sequence parity with the
reference is impossible by construction (SURVEY.md §2.1 sampling row);
matching is statistical.

We hand-roll a threefry2x32-like mixer over counters instead of chaining
`jax.random.fold_in` keys: one fused elementwise pass per draw, no key
bookkeeping inside the bounce loop, trivially vectorized on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

_ROT = (13, 15, 26, 6, 17, 29, 16, 24)


def _rotl(x, r):
    return (x << r) | (x >> (32 - r))


def threefry2x32(k0, k1, x0, x1, rounds: int = 20):
    """Threefry-2x32 block cipher over uint32 arrays (public algorithm,
    same family as jax.random's default PRNG)."""
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


def uniform2(seed, lane, ctr):
    """Two independent U[0,1) float32 per lane.

    seed: python int or scalar; lane: uint32 array of lane ids; ctr: python
    int counter (bounce*K + purpose) — static per call site.
    """
    # The key schedule must be identical whether `seed` is a Python int or a
    # traced scalar — renders must not depend on jit boundaries.
    if isinstance(seed, int):
        s = jnp.uint32(seed & 0xFFFFFFFF)
    else:
        s = jnp.asarray(seed).astype(jnp.uint32)
    s2 = s ^ jnp.uint32(0x9E3779B9)
    x0, x1 = threefry2x32(s, s2, jnp.asarray(lane, jnp.uint32), jnp.uint32(ctr))
    # 24 high bits -> [0, 1) float32 (same construction as jax.random.uniform)
    f0 = (x0 >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
    f1 = (x1 >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
    return f0, f1


def uniform(seed, lane, ctr):
    return uniform2(seed, lane, ctr)[0]
