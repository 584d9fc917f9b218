"""Parity gates for the BVH-fused bounce kernel (ops/pallas_bounce.py:
make_step_bvh): the packet union walk runs INSIDE the bounce program, so
its per-lane results must match the XLA bounce step (whose traversal is
the packet kernel / XLA walk already gated against brute force in
test_bvh.py / test_pallas.py).

Interpret-mode on the CPU mesh; hardware parity is exercised by
tools/bench_fused_bvh.py on the TPU host.
"""

import dataclasses
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import jax
import jax.numpy as jnp

from lumillyrender_tpu.integrator import wavefront
from lumillyrender_tpu.ops import pallas_bounce
from lumillyrender_tpu.scene.compiler import compile_scene
from lumillyrender_tpu.scene.loader import parse_config

SCENE_TOML = """
[renderer]
samples = 4
depth = 5
depth-limit = 64
no-direct-emitter = false
threads = 0
integrator = "INTEGRATOR"

[film]
resolution = [32, 32]
output = "png"
gamma = 2.2

[sky]
SKY

[camera]
type = "ideal-pinhole"
fov = 45
[[camera.transform]]
type = "look-at"
origin = [0, 8, 30]
target = [0, 0, 0]
up = [0, 1, 0]

[[light]]
type = "area"
object = "lamp"
emission = [12, 10, 8]

[[object]]
mesh = "terrain"
material = "ground"

[[object]]
mesh = "ball"
material = "shiny"
[[object.transform]]
type = "translate"
vector = [2, 3, 2]

[[object]]
name = "lamp"
mesh = "lampball"
material = "black"
[[object.transform]]
type = "translate"
vector = [-3, 9, -2]

[[material]]
name = "ground"
type = "lambert"
albedo = [0.6, 0.55, 0.5]

[[material]]
name = "shiny"
type = "ggx"
reflectance = [0.9, 0.85, 0.8]
roughness = 0.4
ior = 20

[[material]]
name = "black"
type = "lambert"
albedo = [0, 0, 0]

[[mesh]]
name = "terrain"
type = "obj"
path = "terrain.obj"

[[mesh]]
name = "ball"
type = "sphere"
radius = 1.5

[[mesh]]
name = "lampball"
type = "sphere"
radius = 1.0
"""

UNIFORM_SKY = 'type = "uniform"\ncolor = [0.4, 0.5, 0.7]'


@pytest.fixture(scope="module")
def terrain_dir(tmp_path_factory):
    """~9k-tri terrain obj (just past the 8192-prim brute crossover)."""
    from bench_bigmesh import make_terrain

    d = tmp_path_factory.mktemp("fusedbvh")
    p0, e1, e2, _ = make_terrain(9000)
    p1 = p0 + e1
    p2 = p0 + e2
    with open(d / "terrain.obj", "w") as f:
        f.write("o terrain\n")
        for a, b, c in zip(p0, p1, p2):
            f.write(f"v {a[0]} {a[1]} {a[2]}\n")
            f.write(f"v {b[0]} {b[1]} {b[2]}\n")
            f.write(f"v {c[0]} {c[1]} {c[2]}\n")
        for i in range(p0.shape[0]):
            f.write(f"f {3 * i + 1} {3 * i + 2} {3 * i + 3}\n")
    return d


def _scene(terrain_dir, integrator="pt-direct", sky=UNIFORM_SKY):
    toml = SCENE_TOML.replace("INTEGRATOR", integrator).replace("SKY", sky)
    c = compile_scene(parse_config(toml, base_dir=terrain_dir))
    return c


def _camera_state(c, n=4096, seed=3):
    from lumillyrender_tpu.ops import camera as camera_ops
    from lumillyrender_tpu.ops import rng

    w, h = c.settings.width, c.settings.height
    lane = jnp.arange(n, dtype=jnp.uint32)
    px = (lane % w).astype(jnp.int32)
    py = ((lane // w) % h).astype(jnp.int32)
    u, v, u2, v2 = rng.uniform4(seed, lane, 0x40000000)
    o, d, pdf, g = camera_ops.sample_rays(
        c.data.camera, c.settings.camera_kind, px, py, w, h, u, v, u2, v2
    )
    return wavefront.PathState(
        bounce=jnp.int32(0),
        o=o, d=d,
        throughput=jnp.ones((n, 3), jnp.float32),
        accum=jnp.zeros((n, 3), jnp.float32),
        alive=jnp.ones((n,), bool),
        rays_traced=jnp.float32(0),
        lane=lane,
    )


@pytest.mark.parametrize("integrator", ["pt", "pt-direct"])
def test_fused_bvh_step_matches_xla(terrain_dir, integrator):
    c = _scene(terrain_dir, integrator=integrator)
    assert pallas_bounce.supported_bvh(c.data, c.settings), (
        c.data.geometry.tri_p0.shape,
        c.data.bvh.pk_nodes.shape,
    )
    state = _camera_state(c)

    step_xla = wavefront.make_bounce_step(
        c.data, c.settings, seed=7, allow_fused=False
    )
    step_fused = pallas_bounce.make_step_bvh(
        c.data, c.settings, seed=7, interpret=True
    )
    sx = jax.jit(step_xla)(state)
    sp = jax.jit(step_fused)(state)

    ax, ap = np.asarray(sx.alive), np.asarray(sp.alive)
    # Tie-flip tolerance: discontinuity-flip doctrine (memory/tests):
    # winner flips only at exact t-ties / EPS-boundary verdicts.
    agree = ax == ap
    assert agree.mean() > 0.999, (~agree).sum()
    for name in ("o", "d", "throughput", "accum"):
        a = np.asarray(getattr(sx, name))[agree]
        b = np.asarray(getattr(sp, name))[agree]
        close = np.isclose(a, b, rtol=2e-4, atol=2e-5).all(axis=-1)
        assert close.mean() > 0.998, (name, (~close).sum())
    assert float(sx.rays_traced) == float(sp.rays_traced)


def test_fused_bvh_ibl_epilogue(terrain_dir, assets_dir):
    sky = (
        'type = "ibl"\npath = "'
        + str(assets_dir / "models" / "ibl" / "test_sky.hdr")
        + '"\nlongitude-offset = 6.0'
    )
    c = _scene(terrain_dir, sky=sky)
    assert pallas_bounce.supported_bvh(c.data, c.settings)
    state = _camera_state(c)
    step_xla = wavefront.make_bounce_step(
        c.data, c.settings, seed=7, allow_fused=False
    )
    step_fused = pallas_bounce.make_step_bvh(
        c.data, c.settings, seed=7, interpret=True
    )
    sx = jax.jit(step_xla)(state)
    sp = jax.jit(step_fused)(state)
    agree = np.asarray(sx.alive) == np.asarray(sp.alive)
    assert agree.mean() > 0.999
    a = np.asarray(sx.accum)[agree]
    b = np.asarray(sp.accum)[agree]
    close = np.isclose(a, b, rtol=2e-4, atol=2e-5).all(axis=-1)
    assert close.mean() > 0.998, (~close).sum()
    # The IBL term actually fired: some miss lane accumulated sky.
    assert float(np.abs(b).sum()) > 0.0


def test_fused_bvh_full_render_statistical(terrain_dir):
    """End-to-end: full renders with the fused-BVH step vs the XLA step
    agree statistically (chaotic per-lane divergence from tie flips makes
    bitwise comparison meaningless over 80 bounces)."""
    from lumillyrender_tpu.integrator.render import render

    c = _scene(terrain_dir)
    c2 = _scene(terrain_dir)
    c2 = dataclasses.replace(
        c2, settings=dataclasses.replace(c2.settings, fused="on")
    )
    c = dataclasses.replace(
        c, settings=dataclasses.replace(c.settings, fused="off")
    )
    fa = np.stack(
        [np.asarray(render(c, seed=s).film) for s in range(20, 26)]
    )
    fb = np.stack(
        [np.asarray(render(c2, seed=s).film) for s in range(40, 46)]
    )
    sys.path.insert(0, str(REPO / "tests"))
    from test_render import _zmap

    z, ok = _zmap(fa, fb)
    frac_bad = float((np.abs(z[ok]) > 5.0).mean())
    assert frac_bad < 0.01, frac_bad
