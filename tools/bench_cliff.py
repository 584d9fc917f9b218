"""Fused-eligibility cliff sweep (round-4 verdict item 7).

A 65th primitive used to silently drop a scene from the ~600 M-class
fused brute kernel (FUSED_NMAX=64 static unroll) to ~100 M-class XLA
stepping, and nothing re-fused until the 8192-prim BVH crossover. This
sweep renders procedurally-generated Lambert-quad scenes across the prim
range under each available path:

  auto      the shipped policy (fused-brute <=64, XLA brute to 8192,
            packet BVH above — now BVH-FUSED via make_step_bvh)
  bvh       intersector forced to 'bvh' => the BVH-fused bounce serves
            every size (the packet walk replaces the unrolled loop)

and writes CLIFF.json. The shipped `_use_brute` crossover is set from
this artifact.

Run ON TPU: python tools/bench_cliff.py
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

HEADER = """
[renderer]
samples = 16
depth = 5
depth-limit = 64
no-direct-emitter = false
threads = 0
integrator = "pt-direct"

[film]
resolution = [256, 256]
output = "png"
gamma = 2.2

[sky]
type = "uniform"
color = [0.3, 0.35, 0.45]

[camera]
type = "ideal-pinhole"
fov = 45
[[camera.transform]]
type = "look-at"
origin = [0, 6, 18]
target = [0, 2, 0]
up = [0, 1, 0]

[[light]]
type = "area"
object = "lamp"
emission = [14, 12, 10]

[[object]]
name = "lamp"
mesh = "lampq"
material = "black"
[[object.transform]]
type = "axis-angle"
axis = [1, 0, 0]
angle = 180
[[object.transform]]
type = "translate"
vector = [0, 10, 0]

[[object]]
mesh = "field"
material = "ground"

[[material]]
name = "ground"
type = "lambert"
albedo = [0.6, 0.55, 0.5]

[[material]]
name = "black"
type = "lambert"
albedo = [0, 0, 0]

[[mesh]]
name = "lampq"
type = "obj"
path = "lamp.obj"

[[mesh]]
name = "field"
type = "obj"
path = "field.obj"
"""


def make_field_obj(path: Path, n_tris: int, seed=0):
    """n_tris triangles as a jittered grid of tilted quads (2 tris each)
    over [-8,8]^2 — every triangle camera-visible."""
    rng = np.random.default_rng(seed)
    n_quads = max(1, n_tris // 2)
    side = int(np.ceil(np.sqrt(n_quads)))
    verts, faces = [], []
    s = 8.0 / side
    k = 0
    for i in range(side):
        for j in range(side):
            if k >= n_quads:
                break
            cx = -8.0 + (2 * i + 1) * s
            cz = -8.0 + (2 * j + 1) * s
            cy = 1.5 + 1.2 * np.sin(i * 0.7) * np.cos(j * 0.9)
            t = rng.uniform(0, 0.4)
            b = len(verts) + 1
            verts += [
                (cx - s, cy + t, cz - s), (cx + s, cy - t, cz - s),
                (cx + s, cy + t, cz + s), (cx - s, cy - t, cz + s),
            ]
            faces += [(b, b + 1, b + 2), (b, b + 2, b + 3)]
            k += 1
    with open(path, "w") as f:
        f.write("o field\n")
        for v in verts:
            f.write(f"v {v[0]:.4f} {v[1]:.4f} {v[2]:.4f}\n")
        for a, b2, c in faces[: n_tris]:
            f.write(f"f {a} {b2} {c}\n")
    return min(n_tris, 2 * n_quads)


def main():
    import jax

    cache = REPO / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import tempfile

    from lumillyrender_tpu.integrator.render import render
    from lumillyrender_tpu.scene.compiler import compile_scene
    from lumillyrender_tpu.scene.loader import parse_config

    work = Path(tempfile.mkdtemp(prefix="cliff_"))
    # lamp quad (2 tris) counts toward the prim budget.
    (work / "lamp.obj").write_text(
        "o lamp\nv -2 0 -2\nv -2 0 2\nv 2 0 2\nv 2 0 -2\nf 1 2 3 4\n"
    )

    sizes = [40, 60, 62, 66, 96, 128, 256, 1024, 4096, 8190, 12288]
    rows = []
    for n in sizes:
        got = make_field_obj(work / "field.obj", n)
        row = {"field_tris": got}
        for mode in ("auto", "bvh"):
            try:
                c = compile_scene(parse_config(HEADER, base_dir=work))
                c = dataclasses.replace(
                    c,
                    settings=dataclasses.replace(
                        c.settings, intersector=mode
                    ),
                )
                row["total_prims"] = int(
                    c.data.geometry.tri_p0.shape[0]
                    + c.data.geometry.sph_c.shape[0]
                )
                r = render(c, seed=3)  # compile + warm
                t0 = time.monotonic()
                r = render(c, seed=4)
                dt = time.monotonic() - t0
                row[f"{mode}_mrays_per_s"] = r.rays / dt / 1e6
            except Exception as e:
                row[f"{mode}_error"] = str(e)[:200]
        print(json.dumps(row), flush=True)
        rows.append(row)

    (REPO / "CLIFF.json").write_text(json.dumps({"sweep": rows}, indent=1))
    print("wrote CLIFF.json")


if __name__ == "__main__":
    main()
