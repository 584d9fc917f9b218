"""Batched 3-vector helpers for (..., 3) arrays. VPU-friendly elementwise ops."""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import EPS


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def norm(a):
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def sqr_norm(a):
    return dot(a, a)


def normalize(a):
    return a / norm(a)[..., None]


def safe_normalize(a, eps=1e-20):
    return a / jnp.maximum(norm(a), eps)[..., None]


def orthonormal_basis(w):
    """(tangent, binormal) for unit normal(s) `w`.

    Parity: `util.rs:10-22` — tangent = normalize(((0,1,0) if |w.x| > EPS
    else (1,0,0)) x w); binormal = w x tangent. The EPS branch is per-lane.
    """
    use_y = jnp.abs(w[..., 0]) > EPS
    a = jnp.where(
        use_y[..., None],
        jnp.array([0.0, 1.0, 0.0], w.dtype),
        jnp.array([1.0, 0.0, 0.0], w.dtype),
    )
    tangent = safe_normalize(cross(a, w))
    binormal = cross(w, tangent)
    return tangent, binormal


def reflect(v, n):
    """Mirror of `v` around `n` (`util.rs:30-32`): -v + 2(v.n)n."""
    return -v + n * (2.0 * dot(v, n))[..., None]


def refract(v, n, eta):
    """Snell refraction (`util.rs:34-43`).

    Returns (direction, valid): on total internal reflection `valid` is
    False and the direction is unspecified (caller must mask).
    eta = n_from / n_to; `v` points away from the surface.
    """
    dn = dot(v, n)
    cos2 = 1.0 - eta**2 * (1.0 - dn**2)
    valid = cos2 > 0.0
    # Guarded before the sqrt so TIR lanes don't NaN the backward pass.
    safe = jnp.sqrt(jnp.where(valid, cos2, 1.0))
    r = -v * eta[..., None] - n * (eta * -dn + safe)[..., None]
    return r, valid


def hemisphere_uniform(u1, u2):
    """Hemisphere direction in local (t, b, n) coordinates with the
    reference's exact construction (`util.rs:98-106`: z = sqrt(u2), radial
    sqrt(1-u2^2) — note it is NOT unit length for all inputs; unused by the
    reference's materials but part of its sampler API)."""
    from ..constants import PI as _PI

    phi = 2.0 * _PI * u1
    r2s = jnp.sqrt(jnp.maximum(1.0 - u2 * u2, 0.0))
    return jnp.stack(
        [jnp.cos(phi) * r2s, jnp.sin(phi) * r2s, jnp.sqrt(u2)], axis=-1
    )


def orienting_normal(out_dir, n):
    """Flip `n` to face `out_dir`'s hemisphere (`material/*.rs orienting_normal`)."""
    return jnp.where(dot(n, out_dir)[..., None] < 0.0, -n, n)
