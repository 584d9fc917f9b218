"""Cross-implementation statistical gate: wavefront renderer vs the
independent scalar oracle (tools/oracle.py).

For each of the five BASELINE.json configs (plus an omnidirectional-camera
extra), renders K seeds with the TPU wavefront renderer and K seeds with
the naive numpy oracle, then compares the two stacks with the per-pixel
Welch z-test (same gate as tests/test_render.py::test_pt_vs_nee_perpixel_
ztest). Both implementations estimate the same integral, so |z| beyond the
null rate means one of them is biased.

Scenes are the repo's parity assets (assets/*.toml) downsized, with the
82k-tri bunny meshes swapped for analytic spheres (the oracle is a scalar
Python tracer; its cost is per-primitive) — every other capability axis of
the configs is preserved: integrator, BSDF families, camera model, sky
model, NEE semantics, obj meshes, intensity-scaled light joins.

Run as a script to produce ORACLE.json at full sampling; tests/
test_oracle.py runs reduced versions of the same gates in CI.
"""

from __future__ import annotations

import dataclasses
import json
import re
import sys
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
ASSETS = REPO / "assets"
sys.path.insert(0, str(REPO))


def _shrink(toml: str, res, spp: int) -> str:
    toml = re.sub(
        r"resolution = \[\d+, \d+\]", f"resolution = [{res[0]}, {res[1]}]",
        toml,
    )
    return re.sub(r"samples = \d+", f"samples = {spp}", toml)


def _asset(name: str) -> str:
    return (ASSETS / name).read_text()


# -------------------------------------------------------------- the scenes
# 1. "pure pt, sphere-only Cornell box, Lambert, pinhole" (BASELINE cfg 1).
#    sample.toml's estimator config with the bunny+cbox swapped for an
#    all-sphere cornell (BASELINE's own wording is "sphere-only").
PT_SPHERES = """
[renderer]
samples = SPP
depth = 5
depth-limit = 64
no-direct-emitter = false
threads = 0
integrator = "pt"

[film]
resolution = [RESX, RESY]
output = "png"
gamma = 2.2

[sky]
type = "uniform"
color = [0.6, 0.7, 0.8]

[camera]
type = "ideal-pinhole"
fov = 39.3077
[[camera.transform]]
type = "look-at"
origin = [278, 273, -800]
target = [278, 273, 0]
up = [0, 1, 0]

[[light]]
type = "area"
object = "lamp"
emission = [36, 30, 24]

[[object]]
mesh = "big"
material = "floor"
[[object.transform]]
type = "translate"
vector = [278, -9750, 278]

[[object]]
mesh = "ball"
material = "blue"
[[object.transform]]
type = "translate"
vector = [180, 120, 280]

[[object]]
mesh = "ball2"
material = "white"
[[object.transform]]
type = "translate"
vector = [400, 90, 200]

[[object]]
name = "lamp"
mesh = "lampball"
material = "black"
[[object.transform]]
type = "translate"
vector = [278, 640, 278]

[[material]]
name = "floor"
type = "lambert"
albedo = [0.74, 0.74, 0.73]

[[material]]
name = "blue"
type = "lambert"
albedo = [0.25, 0.3, 0.65]

[[material]]
name = "white"
type = "lambert"
albedo = [0.7, 0.7, 0.7]

[[material]]
name = "black"
type = "lambert"
albedo = [0, 0, 0]

[[mesh]]
name = "big"
type = "sphere"
radius = 10000

[[mesh]]
name = "ball"
type = "sphere"
radius = 120

[[mesh]]
name = "ball2"
type = "sphere"
radius = 90

[[mesh]]
name = "lampball"
type = "sphere"
radius = 220
"""

# 2. "pt-direct (NEE) on debug-nee with Phong/BlinnPhong" (BASELINE cfg 2):
#    debug-nee's estimator config (pt-direct, sphere light, quad geometry)
#    with a phong floor and a tilted blinn-phong panel. Front-face
#    interactions only: debug-nee's own light placement pokes the sphere
#    through the ceiling quad, and glossy backface-grazing lobes there
#    produce firefly events whose means no feasible spp can compare
#    (the reference has the identical variance structure — this is a gate
#    conditioning choice, not a semantics change).
NEE_PHONG = """
[renderer]
samples = SPP
depth = 5
depth-limit = 64
no-direct-emitter = false
threads = 0
integrator = "pt-direct"

[film]
resolution = [RESX, RESY]
output = "png"
gamma = 2.2

[sky]
type = "uniform"
color = [0, 0, 0]

[camera]
type = "ideal-pinhole"
fov = 39.3077
[[camera.transform]]
type = "look-at"
origin = [278, 273, -800]
target = [278, 273, 0]
up = [0, 1, 0]

[[light]]
type = "area"
object = "light"
emission = [15, 15, 15]

[[object]]
name = "light"
mesh = "light"
material = "lightmat"
[[object.transform]]
type = "translate"
vector = [278, 460, 278]

[[object]]
mesh = "quad"
material = "glossy"
[[object.transform]]
type = "scale"
vector = [250, 250, 250]
[[object.transform]]
type = "translate"
vector = [278, 0, 278]

[[object]]
mesh = "quad"
material = "brushed"
[[object.transform]]
type = "scale"
vector = [250, 250, 250]
[[object.transform]]
type = "axis-angle"
axis = [1, 0, 0]
angle = -70
[[object.transform]]
type = "translate"
vector = [278, 170, 430]

[[material]]
name = "lightmat"
type = "lambert"
albedo = [0, 0, 0]

[[material]]
name = "glossy"
type = "phong"
reflectance = [0.8, 0.75, 0.7]
alpha = 12

[[material]]
name = "brushed"
type = "blinn-phong"
reflectance = [0.7, 0.75, 0.8]
alpha = 16

[[mesh]]
name = "quad"
type = "obj"
path = "models/simple/quad.obj"

[[mesh]]
name = "light"
type = "sphere"
radius = 80
"""

# 5. "IBL sky + full scene, hdr output" (BASELINE cfg 5) + the refraction
#    material: cbox + glass sphere + quad light under the IBL sky.
IBL_REFR = """
[renderer]
samples = SPP
depth = 5
depth-limit = 64
no-direct-emitter = false
threads = 0
integrator = "pt-direct"

[film]
resolution = [RESX, RESY]
output = "hdr"
gamma = 2.2

[sky]
type = "ibl"
path = "models/ibl/test_sky.hdr"
longitude-offset = 6.0

[camera]
type = "ideal-pinhole"
fov = 39.3077
[[camera.transform]]
type = "look-at"
origin = [278, 273, -800]
target = [278, 273, 0]
up = [0, 1, 0]

[[light]]
type = "area"
object = "light"
emission = [20, 17, 14]

[[object]]
mesh = "cbox"

[[object]]
mesh = "glass"
material = "glass"
[[object.transform]]
type = "translate"
vector = [278, 160, 278]

[[object]]
name = "light"
mesh = "lightq"
material = "black"
[[object.transform]]
type = "translate"
vector = [278, 548, 278]

[[material]]
name = "glass"
type = "ideal-refraction"
reflectance = [0.8, 0.85, 0.8]
absorbtance = 0.002
ior = 1.5

[[material]]
name = "black"
type = "lambert"
albedo = [0, 0, 0]

[[mesh]]
name = "cbox"
type = "obj"
path = "models/simple/cbox.obj"

[[mesh]]
name = "glass"
type = "sphere"
radius = 140

[[mesh]]
name = "lightq"
type = "obj"
path = "models/simple/quad.obj"
"""

# Extra: omnidirectional camera (vr.toml, downsized as-is).


def build_scenes(res=(32, 32), spp=24):
    """-> {name: CompiledScene} for the five configs (+ omni extra)."""
    from lumillyrender_tpu.scene.compiler import compile_scene
    from lumillyrender_tpu.scene.loader import parse_config

    def mk(toml):
        toml = (
            toml.replace("SPP", str(spp))
            .replace("RESX", str(res[0]))
            .replace("RESY", str(res[1]))
        )
        return compile_scene(parse_config(toml, base_dir=ASSETS))

    # cfg 4: new-cbox (obj mesh + NEE + intensity join), camera swapped to
    # thin-lens per the config wording, focus on the spheres. The cbox is
    # nudged +0.5 in x: the stock box puts its green wall EXACTLY on the
    # checker's x=0 band edge (`lambert.rs:58-90` signed_mod returns the
    # 0.5 band for x>0+ and the 1.0 band for x<=0), so f32 (renderer) vs
    # f64 (oracle) hit-position rounding lands on systematically different
    # sides of a 2x BRDF knife-edge — the documented discontinuity-flip
    # class from tests/test_fused_bounce.py, not an estimator bug. 0.5
    # units puts the wall solidly inside one band for both precisions.
    newcbox = _shrink(_asset("new-cbox.toml"), res, spp).replace(
        """[camera]
type = "ideal-pinhole"
fov = 39.3077""",
        """[camera]
type = "thin-lens"
fov = 39.3077
focus-distance = 1050
f-number = 6.0""",
    ).replace(
        """[[object]]
mesh = "cbox"
""",
        """[[object]]
mesh = "cbox"
[[object.transform]]
type = "translate"
vector = [0.5, 0, 0]
""",
    )
    assert "thin-lens" in newcbox
    return {
        "pt-spheres": mk(PT_SPHERES),
        "nee-phong-blinn": mk(NEE_PHONG),
        "ggx": mk(_shrink(_asset("brdf.toml"), res, spp)),
        "mesh-thinlens": compile_scene(
            parse_config(newcbox, base_dir=ASSETS)
        ),
        "ibl-refraction": mk(IBL_REFR),
        "omni": mk(
            _shrink(_asset("vr.toml"), (res[0], max(res[1] // 2, 8)), spp)
        ),
    }


def _oracle_film(args):
    scene_pickle, seed = args
    from tools.oracle import OracleScene

    osc = object.__new__(OracleScene)
    osc.__dict__.update(scene_pickle)
    return osc.render(seed)


def oracle_films(compiled, seeds, workers=8):
    from tools.oracle import OracleScene

    osc = OracleScene(compiled)
    args = [(osc.__dict__.copy(), s) for s in seeds]
    if workers <= 1:
        return np.stack([_oracle_film(a) for a in args])
    with ProcessPoolExecutor(max_workers=workers) as ex:
        return np.stack(list(ex.map(_oracle_film, args)))


def renderer_films(compiled, seeds):
    from lumillyrender_tpu.integrator.render import render

    return np.stack(
        [np.asarray(render(compiled, seed=s).film) for s in seeds]
    )


def zmap(fa, fb):
    """Per-pixel Welch z on channel-mean luminance (seeds on axis 0).

    Same statistic as tests/test_render.py::_zmap; duplicated here so the
    artifact script has no test-module import."""
    a, b = fa.mean(axis=3), fb.mean(axis=3)
    ma, mb = a.mean(axis=0), b.mean(axis=0)
    va = a.var(axis=0, ddof=1) / a.shape[0]
    vb = b.var(axis=0, ddof=1) / b.shape[0]
    z = (ma - mb) / np.sqrt(va + vb + 1e-12)
    # Deterministic pixels (zero variance BOTH sides — e.g. sky-only
    # directions) are compared to f32 ulp tolerance, not bitwise: the
    # renderer averages in f32, the oracle in f64, so a constant like
    # 0.8/3 differs in the last ulp without any estimator disagreement.
    close = np.abs(ma - mb) <= 1e-6 * np.maximum(np.abs(ma), 1.0) + 1e-7
    degenerate = ((va == 0) | (vb == 0)) & ~close
    return np.where((va == 0) & (vb == 0) & close, 0.0, z), ~degenerate


def run_gate(name, compiled, n_seeds=8, workers=8):
    seeds_r = list(range(9000, 9000 + n_seeds))
    seeds_o = list(range(100, 100 + n_seeds))
    fr = renderer_films(compiled, seeds_r)
    fo = oracle_films(compiled, seeds_o, workers=workers)
    z, ok = zmap(fr, fo)
    frac_bad = float((np.abs(z[ok]) > 5.0).mean()) if ok.any() else 0.0
    return {
        "config": name,
        "resolution": [compiled.settings.width, compiled.settings.height],
        "spp": compiled.settings.spp,
        "seeds": n_seeds,
        "mean_renderer": float(fr.mean()),
        "mean_oracle": float(fo.mean()),
        "rel_mean_diff": float(
            abs(fr.mean() - fo.mean()) / max(fo.mean(), 1e-9)
        ),
        "max_abs_z": float(np.abs(z[ok]).max()) if ok.any() else 0.0,
        "frac_abs_z_gt5": frac_bad,
        "frac_untestable": float((~ok).mean()),
    }


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    results = []
    scenes = build_scenes(res=(32, 32), spp=32)
    # The omnidirectional view spends most pixels on rarely-lit directions
    # (cbox seen from inside at 32x16 equirect): at 32 spp a third of the
    # pixels are zero-variance-on-one-side rare events the z-test calls
    # untestable. More samples, not a looser gate.
    scenes["omni"] = build_scenes(res=(32, 32), spp=128)["omni"]
    for name, compiled in scenes.items():
        r = run_gate(name, compiled, n_seeds=10)
        print(json.dumps(r))
        results.append(r)
    ok = all(
        r["frac_abs_z_gt5"] < 0.008 and r["frac_untestable"] < 0.05
        for r in results
    )
    out = {
        "description": (
            "Full-estimator cross-check: wavefront TPU renderer vs the "
            "independent scalar numpy oracle (tools/oracle.py), per-pixel "
            "Welch z-test over seed stacks. Gate: frac(|z|>5) < 0.8% and "
            "untestable fraction < 5% on every config."
        ),
        "gate_passed": ok,
        "configs": results,
    }
    (REPO / "ORACLE.json").write_text(json.dumps(out, indent=1))
    print("gate_passed:", ok)


if __name__ == "__main__":
    main()
