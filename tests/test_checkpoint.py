"""Checkpoint/resume: a resumed render must be bitwise-identical to an
uninterrupted one (counter-based RNG), and AOV integrators must work."""

import dataclasses

import numpy as np

from lumillyrender_tpu.integrator.render import render
from lumillyrender_tpu.scene.compiler import compile_scene
from lumillyrender_tpu.scene.loader import parse_config

SCENE = """
[renderer]
samples = 8
integrator = "pt"

[film]
resolution = [24, 24]
output = "png"

[sky]
type = "uniform"
color = [0.8, 0.9, 1.0]

[camera]
type = "ideal-pinhole"
fov = 45
[[camera.transform]]
type = "look-at"
origin = [0, 0, 6]
target = [0, 0, 0]
up = [0, 1, 0]

[[object]]
mesh = "ball"
material = "m"

[[material]]
name = "m"
type = "lambert"
albedo = [0.5, 0.4, 0.3]

[[mesh]]
name = "ball"
type = "sphere"
radius = 1
"""


def scene():
    return compile_scene(parse_config(SCENE))


def test_resume_is_exact(tmp_path):
    c = scene()
    ref = render(c, seed=42, spp_chunk=2)

    ck = tmp_path / "r.ckpt.npz"
    # Render only half (spp=4), checkpointing.
    c_half = scene()
    c_half.settings = dataclasses.replace(c_half.settings, spp=4)
    render(c_half, seed=42, spp_chunk=2, checkpoint=str(ck))
    assert ck.exists()

    # Resume to the full 8 spp.
    c2 = scene()
    resumed = render(c2, seed=42, spp_chunk=2, checkpoint=str(ck))
    assert np.array_equal(ref.film, resumed.film)


def test_checkpoint_rejects_mismatched_config(tmp_path):
    ck = tmp_path / "r.ckpt.npz"
    c = scene()
    render(c, seed=1, spp_chunk=4, checkpoint=str(ck))
    from lumillyrender_tpu.utils import checkpoint as ckpt

    other = scene()
    other.settings = dataclasses.replace(other.settings, width=32)
    assert ckpt.load(ck, other.settings, 1) is None  # resolution differs
    assert ckpt.load(ck, c.settings, 2) is None  # seed differs


def test_aov_normal_and_depth():
    c = scene()
    c.settings = dataclasses.replace(c.settings, integrator="normal")
    r = render(c, seed=0)
    # Center pixel looks at the sphere front: normal ~ +z -> (0.5, 0.5, 1.0)
    center = r.film[12, 12]
    assert abs(center[2] - 1.0) < 0.05
    assert np.all((r.film >= 0) & (r.film <= 1.0 + 1e-5))

    c2 = scene()
    c2.settings = dataclasses.replace(c2.settings, integrator="depth")
    r2 = render(c2, seed=0)
    assert abs(r2.film[12, 12, 0] - 5.0) < 0.05  # camera at z=6, sphere r=1
    assert r2.film[0, 0, 0] == 0.0  # miss -> 0
