"""IBL sky correctness: known-texel lookups and the longitude offset.

Reference semantics (`sky.rs:57-79`): y-up equirectangular, theta = acos(y),
phi = atan2(z, x), u = ((phi + pi + longitude_offset) / 2pi) mod 1 with the
offset in RADIANS (quirk #14), v = (theta / pi) mod 1, nearest-neighbor
texel at (floor(w*u), floor(h*v)), flat index wrapped mod w*h.
"""

import math

import jax.numpy as jnp
import numpy as np

from lumillyrender_tpu.ops import sky as sky_ops
from lumillyrender_tpu.scene.data import SKY_IBL, SkyData


def _coord_ibl(h=8):
    """Texture whose texel (y, x) stores (x, y, 1) — lookups are readable."""
    w = 2 * h
    img = np.zeros((h, w, 3), np.float32)
    img[..., 0] = np.arange(w)[None, :]
    img[..., 1] = np.arange(h)[:, None]
    img[..., 2] = 1.0
    return img


def _sky(img, offset=0.0):
    return SkyData(
        color=jnp.zeros(3),
        color2=jnp.zeros(3),
        ibl=jnp.asarray(img),
        longitude_offset=jnp.float32(offset),
    )


def _expected(d, h, offset):
    """Independent oracle transcribing `sky.rs:57-79` scalar math."""
    w = 2 * h
    theta = math.acos(max(-1.0, min(1.0, d[1])))
    phi = math.atan2(d[2], d[0])
    u = ((phi + math.pi + offset) / (2 * math.pi)) % 1.0
    v = (theta / math.pi) % 1.0
    x = int(w * u)
    y = int(h * v)
    return (y * w + x) % (w * h)


def test_known_directions_hit_expected_texels():
    h = 8
    img = _coord_ibl(h)
    dirs = np.array(
        [
            [0.0, 1.0, 0.0],  # zenith -> v = 0 row
            [0.0, -1.0, 0.0],  # nadir (v wraps: acos(-1)/pi = 1 -> v=0)
            [1.0, 0.0, 0.0],  # +x equator: phi = 0 -> u = 0.5
            [-1.0, 0.0, 1e-7],  # -x equator: phi ~ pi -> u ~ 1 (wraps)
            [0.0, 0.0, 1.0],  # +z equator: phi = pi/2 -> u = 0.75
            [0.5, 0.5, -0.5],
        ],
        np.float32,
    )
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    got = np.asarray(sky_ops.radiance(_sky(img), SKY_IBL, jnp.asarray(dirs)))
    flat = img.reshape(-1, 3)
    for i, d in enumerate(dirs):
        idx = _expected(d, h, 0.0)
        np.testing.assert_allclose(got[i], flat[idx], atol=1e-6, err_msg=str(d))
    # Spot-check absolute coordinates, not just the oracle: +x equator is
    # mid-row (u=0.5 -> x=w/2=8), mid-height (v=0.5 -> y=4).
    np.testing.assert_allclose(got[2], [8.0, 4.0, 1.0])
    # +z equator: u=0.75 -> x=12.
    np.testing.assert_allclose(got[4], [12.0, 4.0, 1.0])


def test_longitude_offset_shifts_u_in_radians():
    h = 8
    img = _coord_ibl(h)
    d = jnp.asarray([[1.0, 0.0, 0.0]])
    # offset pi/2 radians = quarter turn = w/4 = 4 texels.
    base = np.asarray(sky_ops.radiance(_sky(img, 0.0), SKY_IBL, d))[0]
    off = np.asarray(sky_ops.radiance(_sky(img, math.pi / 2), SKY_IBL, d))[0]
    assert base[0] == 8.0 and off[0] == 12.0
    assert base[1] == off[1] == 4.0
    # The scenes pass e.g. 6.0 (ridaisai-2018.toml:21): 6 radians, NOT a
    # texel/degree count — verify against the scalar oracle.
    got6 = np.asarray(sky_ops.radiance(_sky(img, 6.0), SKY_IBL, d))[0]
    idx = _expected([1.0, 0.0, 0.0], h, 6.0)
    np.testing.assert_allclose(got6, img.reshape(-1, 3)[idx])


def test_random_directions_match_oracle():
    h = 16
    img = np.random.default_rng(3).random((h, 2 * h, 3)).astype(np.float32)
    rng = np.random.default_rng(4)
    dirs = rng.normal(size=(256, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    for offset in (0.0, 6.0):
        got = np.asarray(
            sky_ops.radiance(_sky(img, offset), SKY_IBL, jnp.asarray(dirs))
        )
        flat = img.reshape(-1, 3)
        exp = np.stack([flat[_expected(d, h, offset)] for d in dirs])
        # Texel-boundary directions may legitimately round differently in
        # float32 vs float64 scalar math; require >99% exact agreement and
        # boundary-adjacency for the rest.
        same = (got == exp).all(axis=1)
        assert same.mean() > 0.99, same.mean()
