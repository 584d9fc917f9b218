"""Sky / environment light evaluation.

Parity: `src/sky.rs`. `UniformSky` and `IBLSky` are reachable from TOML
(`description.rs:58-65`); `SimpleSky` (`sky.rs:23-33`) is dead code in the
reference but kept here for capability parity (see `simple_radiance`).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import PI
from ..scene.data import SKY_IBL, SKY_SIMPLE, SkyData
from . import vec


def radiance(sky: SkyData, kind: int, d) -> jnp.ndarray:
    """Environment radiance for ray directions d (N,3) -> (N,3)."""
    if kind == SKY_SIMPLE:
        return simple_radiance(sky.color, sky.color2, d)
    if kind != SKY_IBL:
        return jnp.broadcast_to(sky.color, d.shape)

    # Equirect lookup (`sky.rs:57-79`): y-up, u offset by longitude_offset
    # in RADIANS (quirk #14), nearest-neighbor texel, width == 2*height.
    h = sky.ibl.shape[0]
    w = sky.ibl.shape[1]
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 2], d[..., 0])
    u = jnp.mod((phi + PI + sky.longitude_offset) / (2.0 * PI), 1.0)
    v = jnp.mod(theta / PI, 1.0)
    x = jnp.floor(w * u).astype(jnp.int32)
    y = jnp.floor(h * v).astype(jnp.int32)
    # Reference wraps `index % all` over the flattened image (`sky.rs:73-74`).
    idx = jnp.mod(y * w + x, w * h)
    flat = sky.ibl.reshape(-1, 3)
    return jnp.take(flat, idx, axis=0)


def simple_radiance(meridian, horizon, d) -> jnp.ndarray:
    """`SimpleSky` lerp by |dir . up| (`sky.rs:28-33`)."""
    weight = jnp.abs(vec.dot(d, jnp.array([0.0, 1.0, 0.0], d.dtype)))[..., None]
    return meridian * weight + horizon * (1.0 - weight)
