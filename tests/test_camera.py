"""Camera model properties: pinhole geometry, thin-lens focus behavior,
estimator-weight cancellation, simple sky, telemetry occupancy."""

import dataclasses

import numpy as np

from lumillyrender_tpu.integrator.render import render
from lumillyrender_tpu.scene.compiler import compile_scene
from lumillyrender_tpu.scene.loader import parse_config

BASE = """
[renderer]
samples = SPP
integrator = "pt"

[film]
resolution = [33, 33]
output = "png"
gamma = 1.0

[sky]
type = "uniform"
color = [1, 1, 1]

[camera]
CAMERA

[[object]]
mesh = "ball"
material = "m"
[[object.transform]]
type = "translate"
vector = [165, 0, 165]

[[material]]
name = "m"
type = "lambert"
albedo = [0.0, 0.0, 0.0]

[[mesh]]
name = "ball"
type = "sphere"
radius = 2
"""

LOOKAT = """
[[camera.transform]]
type = "look-at"
origin = [165, 0, 145]
target = [165, 0, 165]
up = [0, 1, 0]
"""


def scene(camera: str, spp=16):
    cfg = parse_config(
        BASE.replace("CAMERA", camera + LOOKAT).replace("SPP", str(spp))
    )
    return compile_scene(cfg)


def test_ideal_pinhole_black_sphere_silhouette():
    """A black sphere on white sky: the silhouette radius checks the
    pinhole projection (fov 40 deg at distance 20, radius 2)."""
    c = scene('type = "ideal-pinhole"\nfov = 40')
    r = render(c, seed=0)
    dark = r.film.mean(axis=2) < 0.5
    assert dark[16, 16]  # center covered
    # Expected angular radius: asin(2/20) = 5.74 deg; half-image = 20 deg.
    frac = dark.sum() / dark.size
    expect = np.pi * (np.sin(np.arcsin(0.1)) / np.tan(np.radians(20))) ** 2 / 4
    assert abs(frac - expect) / expect < 0.2, (frac, expect)


def test_thin_lens_in_focus_matches_pinhole():
    """Thin lens focused exactly on the sphere center plane must produce a
    sharp silhouette ~equal to the ideal pinhole's."""
    c_p = scene('type = "ideal-pinhole"\nfov = 40')
    c_l = scene(
        'type = "thin-lens"\nfov = 40\nfocus-distance = 20\nf-number = 2.0'
    )
    r_p = render(c_p, seed=1)
    r_l = render(c_l, seed=1)
    dark_p = (r_p.film.mean(axis=2) < 0.5).sum()
    dark_l = (r_l.film.mean(axis=2) < 0.5).sum()
    assert abs(dark_p - dark_l) <= max(6, 0.15 * dark_p), (dark_p, dark_l)
    # Thin-lens estimator weight reduces to exactly cos^4 (sensitivity
    # cancels both pdfs, g = cos^4/asd^2 — natural vignetting, matching
    # `camera.rs:387-394,447-454`). Corner pixel of a white sky == cos^4.
    sx, sy = np.asarray(c_l.data.camera.sensor_size)
    px = (0.5 / 33 - 0.5) * sx  # pixel (0,0) sample center-ish
    py = (0.5 / 33 - 0.5) * sy
    cos = 50.0 / np.sqrt(50.0**2 + px**2 + py**2)
    assert np.abs(r_l.film[0, 0] - cos**4).max() < 0.03, (
        r_l.film[0, 0], cos**4,
    )


def test_thin_lens_out_of_focus_blurs():
    c_near = scene(
        'type = "thin-lens"\nfov = 40\nfocus-distance = 20\nf-number = 1.0', spp=32
    )
    c_off = scene(
        'type = "thin-lens"\nfov = 40\nfocus-distance = 6\nf-number = 1.0', spp=32
    )
    r_near = render(c_near, seed=2)
    r_off = render(c_off, seed=2)
    # Out-of-focus: fewer fully-dark pixels, more partially-dark ones.
    full_dark_near = (r_near.film.mean(axis=2) < 0.1).sum()
    full_dark_off = (r_off.film.mean(axis=2) < 0.1).sum()
    assert full_dark_off < full_dark_near


def test_realistic_pinhole_extension():
    """`pinhole` (reference's unreachable PinholeCamera): small aperture
    behaves like the ideal pinhole; sensitivity normalizes the sky to 1."""
    c = scene('type = "pinhole"\nfov = 40\naperture-radius = 0.01', spp=16)
    r = render(c, seed=3)
    # Same cos^4 vignetting as the thin lens (shared estimator math).
    sx, sy = np.asarray(c.data.camera.sensor_size)
    px = (0.5 / 33 - 0.5) * sx
    py = (0.5 / 33 - 0.5) * sy
    cos = 50.0 / np.sqrt(50.0**2 + px**2 + py**2)
    assert abs(float(r.film[0, 0].mean()) - cos**4) < 0.03
    assert r.film.mean(axis=2)[16, 16] < 0.5


def test_simple_sky_extension():
    cfg = parse_config(
        BASE.replace(
            "CAMERA", 'type = "ideal-pinhole"\nfov = 40' + LOOKAT
        ).replace("SPP", "4").replace(
            '[sky]\ntype = "uniform"\ncolor = [1, 1, 1]',
            '[sky]\ntype = "simple"\nmeridian = [0.1, 0.2, 0.9]\nhorizon = [0.9, 0.8, 0.7]',
        )
    )
    c = compile_scene(cfg)
    r = render(c, seed=4)
    # Mid-row edge pixel looks horizontally (dir.up ~ 0) -> horizon color;
    # top edge looks ~26 deg up -> lerped toward meridian (`sky.rs:28-33`).
    assert np.allclose(r.film[16, 0], [0.9, 0.8, 0.7], atol=0.05)
    assert r.film[0, 16, 2] > r.film[16, 0, 2]  # bluer toward the meridian


def test_bounce_occupancy_telemetry():
    import jax.numpy as jnp

    from lumillyrender_tpu.ops import camera as cam_ops, rng
    from lumillyrender_tpu.utils.telemetry import bounce_occupancy

    c = scene('type = "ideal-pinhole"\nfov = 40', spp=1)
    s = c.settings
    n = s.width * s.height
    lane = jnp.arange(n, dtype=jnp.uint32)
    px = (lane % s.width).astype(jnp.int32)
    py = ((lane // s.width) % s.height).astype(jnp.int32)
    u, v = rng.uniform2(0, lane, 1)
    o, d, _, _ = cam_ops.sample_rays(
        c.data.camera, s.camera_kind, px, py, s.width, s.height, u, v, u, v
    )
    occ = bounce_occupancy(c.data, s, o, d, lane, 0, max_bounces=6)
    assert occ.shape == (6,)
    assert occ[0] <= n
    assert (np.diff(occ) <= 0).all()  # occupancy only decays


def test_camera_info_parity():
    """CameraInfo math (`camera.rs:121-133,482-498`)."""
    from lumillyrender_tpu.ops.camera import camera_info

    c = scene('type = "ideal-pinhole"\nfov = 40')
    info = camera_info(c.data.camera, c.settings.camera_kind)
    assert abs(info["xfov"] - 40.0) < 1e-3
    assert info["f_number"] == float("inf")
    assert abs(info["focal_length"] - 50.0) < 1e-3

    c2 = scene('type = "thin-lens"\nfov = 40\nfocus-distance = 20\nf-number = 2.0')
    info2 = camera_info(c2.data.camera, c2.settings.camera_kind)
    # focal = 1/(1/50 + 1/20); aperture_radius = focal/f_number/2;
    # info f_number = focal/radius/2 == f_number * ... (reference algebra
    # gives back exactly the configured f-number: r = f/N/2, N' = f/r/2 = N)
    assert abs(info2["f_number"] - 2.0) < 1e-4


def test_hemisphere_uniform_reference_construction():
    """`util.rs:98-106` exact construction (z = sqrt(u2), radial sqrt(1-u2^2))."""
    import jax.numpy as jnp

    from lumillyrender_tpu.ops.vec import hemisphere_uniform

    d = np.asarray(hemisphere_uniform(jnp.asarray([0.25]), jnp.asarray([0.5])))
    assert abs(d[0, 2] - np.sqrt(0.5)) < 1e-6
    r = np.hypot(d[0, 0], d[0, 1])
    assert abs(r - np.sqrt(1 - 0.25)) < 1e-6
