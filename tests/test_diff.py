"""Gradient gates: autodiff vs central finite differences (same seeds,
sampling measure pinned at theta0 on both sides), plus an analytic identity.

This is the north-star correctness gate from BASELINE.json: pixel gradients
w.r.t. material parameters (albedo, roughness, emission) and camera
parameters must match the FD oracle allclose.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumillyrender_tpu.diff.render import DiffParams, params_of, render_diff
from lumillyrender_tpu.scene.compiler import compile_scene
from lumillyrender_tpu.scene.loader import parse_config

SCENE = """
[renderer]
samples = 4
integrator = "INTEGRATOR"
depth = 3
depth-limit = 8

[film]
resolution = [12, 12]
output = "png"

[sky]
type = "uniform"
color = [0.4, 0.5, 0.6]

[camera]
type = "ideal-pinhole"
fov = 45
[[camera.transform]]
type = "look-at"
origin = [165, 0, 135]
target = [165, 0, 165]
up = [0, 1, 0]

[[light]]
type = "area"
object = "lamp"
emission = [6, 5, 4]

[[object]]
name = "lamp"
mesh = "ball"
material = "black"
[[object.transform]]
type = "translate"
vector = [165, 9, 165]

[[object]]
mesh = "ball"
material = "diffuse"
[[object.transform]]
type = "translate"
vector = [163, 0, 165]

[[object]]
mesh = "ball"
material = "metal"
[[object.transform]]
type = "translate"
vector = [168, 0, 168]

[[material]]
name = "black"
type = "lambert"
albedo = [0, 0, 0]

[[material]]
name = "diffuse"
type = "lambert"
albedo = [0.6, 0.45, 0.3]

[[material]]
name = "metal"
type = "ggx"
reflectance = [0.9, 0.8, 0.7]
roughness = 0.45
ior = 100

[[mesh]]
name = "ball"
type = "sphere"
radius = 2
"""


def scene_for(integrator="pt-direct", max_bounces=5, spp=4):
    cfg = parse_config(SCENE.replace("INTEGRATOR", integrator))
    c = compile_scene(cfg, spp=spp)
    c.settings = dataclasses.replace(c.settings, max_bounces=max_bounces)
    return c


def objective(c, params, params0):
    """Mean film brightness with the sampling measure pinned at params0."""
    film = render_diff(
        c.data, c.settings, params, seed=21, spp=c.settings.spp,
        params_sample=params0,
    )
    return jnp.mean(film)


def fd_vs_ad(c, get_leaf, set_leaf, eps, atol, rtol):
    params0 = params_of(c.data)
    f = jax.jit(lambda p: objective(c, p, params0))
    grad = jax.jit(jax.grad(lambda p: objective(c, p, params0), allow_int=True))(
        params0
    )
    g_ad = float(get_leaf(grad))

    def with_delta(d):
        return set_leaf(params0, float(get_leaf(params0)) + d)

    # float32 FD needs a generous step; we use central differences. A single
    # step size can land a lane exactly on a discrete boundary (intersection
    # EPS cutoff, lobe pick) and return garbage — the estimator is piecewise
    # smooth, not smooth — so take the MEDIAN over three step sizes; an
    # isolated boundary crossing contaminates one of them, not two.
    def central(e):
        return (float(f(with_delta(e))) - float(f(with_delta(-e)))) / (2 * e)

    g_fd = float(np.median([central(eps / 2), central(eps), central(2 * eps)]))
    assert np.isfinite(g_ad) and np.isfinite(g_fd)
    assert abs(g_ad - g_fd) < atol + rtol * abs(g_fd), (g_ad, g_fd)
    return g_ad, g_fd


def _set_mat(params: DiffParams, field, idx, value) -> DiffParams:
    table = params.materials
    arr = getattr(table, field)
    arr = arr.at[idx].set(value)
    return params._replace(materials=dataclasses.replace(table, **{field: arr}))


def _set_cam(params: DiffParams, field, idx, value) -> DiffParams:
    cam = params.camera
    arr = getattr(cam, field)
    arr = arr.at[idx].set(value) if arr.ndim else jnp.asarray(value, arr.dtype)
    return params._replace(camera=dataclasses.replace(cam, **{field: arr}))


# Material row ids in the compiled table: black=0, diffuse=1, metal=2 (order
# of first use in object list).


def test_albedo_grad_matches_fd():
    c = scene_for()
    g_ad, g_fd = fd_vs_ad(
        c,
        get_leaf=lambda p: p.materials.color[1, 0],
        set_leaf=lambda p, v: _set_mat(p, "color", (1, 0), v),
        eps=2e-2, atol=2e-4, rtol=0.08,
    )
    assert g_ad > 0  # brighter albedo -> brighter image


def test_emission_grad_matches_fd():
    c = scene_for()
    g_ad, g_fd = fd_vs_ad(
        c,
        get_leaf=lambda p: p.materials.emission[0, 1],
        set_leaf=lambda p, v: _set_mat(p, "emission", (0, 1), v),
        eps=0.5, atol=1e-5, rtol=0.05,
    )
    assert g_ad > 0


def test_roughness_grad_matches_fd():
    c = scene_for()
    fd_vs_ad(
        c,
        get_leaf=lambda p: p.materials.alpha[2],
        set_leaf=lambda p, v: _set_mat(p, "alpha", 2, v),
        eps=2e-2, atol=5e-4, rtol=0.1,
    )


def test_ior_grad_matches_fd():
    c = scene_for()
    fd_vs_ad(
        c,
        get_leaf=lambda p: p.materials.ior[2],
        set_leaf=lambda p, v: _set_mat(p, "ior", 2, v),
        eps=2.0, atol=1e-6, rtol=0.1,
    )


def test_camera_position_grad_matches_fd():
    """Geometric gradient through ray origins and intersection distances."""
    c = scene_for(integrator="pt", max_bounces=3)
    fd_vs_ad(
        c,
        get_leaf=lambda p: p.camera.aperture_position[2],
        set_leaf=lambda p, v: _set_cam(p, "aperture_position", 2, v),
        eps=5e-2, atol=2e-3, rtol=0.25,
    )


def test_emission_grad_analytic_direct_view():
    """A lamp filling part of the frame with pt: d(mean)/d(emission_ch) ==
    fraction of samples hitting the lamp / 3 (mean over channels)."""
    cfg = parse_config(SCENE.replace("INTEGRATOR", "pt"))
    c = compile_scene(cfg, spp=8)
    c.settings = dataclasses.replace(c.settings, max_bounces=1)
    params0 = params_of(c.data)
    g = jax.grad(lambda p: objective(c, p, params0), allow_int=True)(params0)
    # With max_bounces=1 only direct lamp hits contribute emission; gradient
    # w.r.t. emission[0] channel c equals (lamp-hit fraction)/3.
    ge = np.asarray(g.materials.emission[0])
    assert (ge >= 0).all()
    assert np.allclose(ge, ge[0])  # channel-symmetric by construction


def _with_ibl(c, h=8, seed=2):
    """Swap the compiled scene's uniform sky for a random IBL texture."""
    from lumillyrender_tpu.scene.data import SKY_IBL, SkyData

    img = np.random.default_rng(seed).random((h, 2 * h, 3)).astype(np.float32)
    img = img * 0.8 + 0.2
    c.data = dataclasses.replace(
        c.data,
        sky=SkyData(
            color=jnp.zeros(3),
            color2=jnp.zeros(3),
            ibl=jnp.asarray(img),
            longitude_offset=jnp.float32(6.0),
        ),
    )
    c.settings = dataclasses.replace(c.settings, sky_kind=SKY_IBL)
    return c


def _set_sky_texel(params: DiffParams, idx, value) -> DiffParams:
    sky = params.sky
    return params._replace(
        sky=dataclasses.replace(sky, ibl=sky.ibl.at[idx].set(value))
    )


def test_albedo_grad_matches_fd_through_ibl():
    """BASELINE config 5 gate: material gradients with the IBL sky lighting
    the scene — the miss path's texel gather sits inside the backward chain."""
    c = _with_ibl(scene_for())
    g_ad, g_fd = fd_vs_ad(
        c,
        get_leaf=lambda p: p.materials.color[1, 0],
        set_leaf=lambda p, v: _set_mat(p, "color", (1, 0), v),
        eps=2e-2, atol=2e-4, rtol=0.08,
    )
    assert g_ad > 0  # IBL is strictly positive -> brighter albedo, brighter image


def test_ibl_texel_grad_matches_fd():
    """Environment-map gradient: film is LINEAR in each texel given the
    (detached) texel pick, so AD must match FD to float32 precision."""
    c = _with_ibl(scene_for(integrator="pt"))
    params0 = params_of(c.data)
    g = jax.grad(lambda p: objective(c, p, params0), allow_int=True)(params0)
    g_tex = np.asarray(g.sky.ibl)
    assert g_tex.shape == c.data.sky.ibl.shape
    assert (g_tex >= 0).all() and g_tex.sum() > 0
    # FD on the single most-hit texel.
    idx = np.unravel_index(np.argmax(g_tex), g_tex.shape)
    f = jax.jit(lambda p: objective(c, p, params0))
    eps = 0.1
    v0 = float(params0.sky.ibl[idx])
    g_fd = (
        float(f(_set_sky_texel(params0, idx, v0 + eps)))
        - float(f(_set_sky_texel(params0, idx, v0 - eps)))
    ) / (2 * eps)
    g_ad = float(g_tex[idx])
    assert abs(g_ad - g_fd) < 1e-5 + 0.01 * abs(g_fd), (g_ad, g_fd)


def test_welcome_geo_config5_grad_matches_fd(assets_dir):
    """BASELINE config 5 end-to-end: the full welcome-geo scene (82k-tri
    bunny + cbox objs, SAH-BVH, IBL sky, thin-lens camera, NEE) must produce
    material gradients that match finite differences. Material row 0 is
    "mat" (the bunny/cbox Lambert — first object's material)."""
    import dataclasses as dc

    from lumillyrender_tpu.scene.compiler import compile_scene_file

    c = compile_scene_file(assets_dir / "welcome-geo.toml", spp=2)
    c.settings = dc.replace(
        c.settings, width=12, height=9, max_bounces=2
    )
    g_ad, g_fd = fd_vs_ad(
        c,
        get_leaf=lambda p: p.materials.color[0, 0],
        set_leaf=lambda p, v: _set_mat(p, "color", (0, 0), v),
        eps=2e-2, atol=1e-2, rtol=0.08,
    )
    assert g_ad > 0


def test_inverse_rendering_converges():
    """End-to-end: recover a perturbed albedo by gradient descent against a
    rendered target."""
    from lumillyrender_tpu.diff.render import film_and_grads

    c = scene_for(spp=8, max_bounces=4)
    params_true = params_of(c.data)
    target = render_diff(c.data, c.settings, params_true, seed=33, spp=8)

    params = _set_mat(params_true, "color", (1, 0), 0.15)  # perturb red albedo
    lr = 30.0
    val0 = float(params.materials.color[1, 0])
    for i in range(80):
        loss, film, grads = film_and_grads(
            c.data, c.settings, params, target, 33, 8
        )
        g = grads.materials.color[1, 0]
        params = _set_mat(
            params, "color", (1, 0), float(params.materials.color[1, 0] - lr * g)
        )
    val = float(params.materials.color[1, 0])
    assert abs(val - 0.6) < abs(val0 - 0.6) * 0.2, (val0, val)
