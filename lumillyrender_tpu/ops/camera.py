"""Vectorized camera ray generation.

Parity: `src/camera.rs`. One fused kernel generates a whole wavefront of
primary rays (lane = pixel x sample); all three reachable camera models
(`description.rs:50-54`) are supported, plus the "realistic pinhole" that
exists in the reference but is unreachable from TOML (`camera.rs:199-337`)
— we expose it through the same thin-lens math with focus at infinity.

Returns (origin, direction, pdf, g_term); the Monte Carlo estimator then
weights radiance by `g * sensitivity / pdf` (`main.rs:95-102`).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import PI
from ..scene.data import (
    CAM_IDEAL_PINHOLE,
    CAM_OMNIDIRECTIONAL,
    CAM_PINHOLE,
    CAM_THIN_LENS,
    CameraData,
)
from . import vec


def camera_info(cam: CameraData, kind: int) -> dict:
    """Debug camera info (`camera.rs:121-133,482-498,501-508`): focal
    length, sensor diagonal, fov/xfov, f-number. Host-side."""
    import numpy as np

    if kind == CAM_OMNIDIRECTIONAL:
        raise NotImplementedError("omnidirectional camera has no CameraInfo")
    sx, sy = (float(x) for x in np.asarray(cam.sensor_size))
    asd = float(cam.aperture_sensor_distance)
    diag = (sx**2 + sy**2) ** 0.5
    fov = 2.0 * np.arctan(diag / 2.0 / asd) * 180.0 / PI
    xfov = 2.0 * np.arctan(sx / 2.0 / asd) * 180.0 / PI
    if kind == CAM_THIN_LENS:
        focal = 1.0 / (1.0 / asd + 1.0 / float(cam.focus_distance))
        f_number = focal / float(cam.aperture_radius) / 2.0
    elif kind == CAM_PINHOLE:
        focal = asd
        f_number = focal / float(cam.aperture_radius) / 2.0
    else:
        focal = asd
        f_number = float("inf")
    return dict(
        focal_length=focal, sensor_diagonal=diag, fov=fov, xfov=xfov,
        f_number=f_number,
    )


def sample_rays(cam: CameraData, kind: int, px, py, width, height, u, v, u2, v2):
    """Generate rays for pixel indices (px, py) with uniforms u,v,u2,v2.

    px/py: int32 arrays (lane,). u..v2: float32 (lane,) in [0,1).
    Returns (origin (lane,3), dir (lane,3), pdf (lane,), g (lane,)).
    """
    if kind == CAM_OMNIDIRECTIONAL:
        # Equirect direction; deliberately ignores the camera basis —
        # quirk #13 (`camera.rs:169-188`).
        p = (px.astype(jnp.float32) + u) / width * (2.0 * PI)
        t = (py.astype(jnp.float32) + v) / height * PI
        st, ct = jnp.sin(t), jnp.cos(t)
        d = jnp.stack([st * jnp.cos(p), st * jnp.sin(p), ct], axis=-1)
        o = jnp.broadcast_to(cam.aperture_position, d.shape)
        one = jnp.ones(px.shape, jnp.float32)
        return o, d, one, one

    # Shared sensor sampling (`camera.rs:64-81,411-428`): note the MINUS on
    # the right axis (sensor is mirrored through the aperture).
    sx = (((px.astype(jnp.float32) + u) / width) - 0.5) * cam.sensor_size[0]
    sy = (((py.astype(jnp.float32) + v) / height) - 0.5) * cam.sensor_size[1]
    sensor_point = (
        cam.position - cam.right * sx[..., None] + cam.up * sy[..., None]
    )

    if kind == CAM_IDEAL_PINHOLE:
        o = jnp.broadcast_to(cam.aperture_position, sensor_point.shape)
        d = vec.normalize(o - sensor_point)
        one = jnp.ones(px.shape, jnp.float32)
        return o, d, one, one  # pdf=1, g=1 (`camera.rs:100-119`)

    # Shared finite-aperture sampling (`camera.rs:285-300,430-445`).
    theta = 2.0 * PI * u2
    rad = jnp.sqrt(v2) * cam.aperture_radius
    aperture_point = (
        cam.aperture_position
        + cam.right * (jnp.cos(theta) * rad)[..., None]
        + cam.up * (jnp.sin(theta) * rad)[..., None]
    )
    pdf_s = 1.0 / (cam.sensor_size[0] * cam.sensor_size[1] / (width * height))
    pdf_a = 1.0 / (PI * cam.aperture_radius**2)
    d0 = vec.normalize(aperture_point - sensor_point)
    cos = vec.dot(d0, cam.forward)
    dist = cam.aperture_sensor_distance / cos
    g = cos * cos / (dist * dist)
    pdf = jnp.full(px.shape, pdf_s * pdf_a, jnp.float32)

    if kind == CAM_PINHOLE:
        # Realistic pinhole (`camera.rs:312-328`): ray straight through the
        # sampled aperture point, no focus-plane projection.
        return aperture_point, d0, pdf, g

    # thin lens (`camera.rs:458-476`): project the sensor->aperture-center
    # ray onto the focus plane and aim the ray there.
    sensor_center = cam.aperture_position - sensor_point
    object_plane = sensor_center * (
        cam.focus_distance / vec.dot(sensor_center, cam.forward)
    )[..., None]
    d = vec.normalize(cam.aperture_position + object_plane - aperture_point)
    return aperture_point, d, pdf, g
