"""Generate self-golden films for round-over-round regression testing.

Renders the BASELINE.json configs at a small fixed resolution / spp /
seed on the CPU backend (the exact environment tests/test_goldens.py uses)
and stores them as float32 .npz under tests/goldens/. Commit the result.

Regenerate ONLY when the estimator is changed intentionally:
    python tools/make_goldens.py
then review the per-config mean shifts it prints before committing.
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

# Same platform setup as tests/conftest.py so goldens match the test env.
import os

os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

# (scene, width, height, spp) — small but structured enough that any
# estimator change moves pixels.
CONFIGS = [
    ("primitive.toml", 48, 48, 8),
    ("debug-nee.toml", 48, 48, 8),
    ("brdf.toml", 64, 24, 8),
    ("new-cbox.toml", 48, 48, 8),
    ("ibl-material.toml", 48, 36, 8),
    ("welcome-geo.toml", 32, 24, 4),  # config 5: 82k-tri BVH + IBL + thin lens
    ("many-light.toml", 32, 32, 8),  # 256 light prims: searchsorted NEE pick
]
SEED = 1234


def main() -> None:
    import dataclasses
    import subprocess

    from lumillyrender_tpu.integrator.render import render
    from lumillyrender_tpu.scene.compiler import compile_scene_file

    assets = REPO / "assets"
    if not (assets / "models" / "simple" / "cbox.obj").exists():
        subprocess.run(
            [sys.executable, str(REPO / "tools" / "make_assets.py"),
             str(assets)],
            check=True,
        )
    out_dir = REPO / "tests" / "goldens"
    out_dir.mkdir(parents=True, exist_ok=True)

    for name, w, h, spp in CONFIGS:
        c = compile_scene_file(assets / name, spp=spp)
        c.settings = dataclasses.replace(c.settings, width=w, height=h)
        film = render(c, seed=SEED).film.astype(np.float32)
        out = out_dir / (Path(name).stem + ".npz")
        prev = None
        if out.exists():
            prev = np.load(out)["film"]
        np.savez_compressed(out, film=film, seed=SEED, spp=spp)
        if prev is not None and prev.shape == film.shape:
            print(f"{name}: mean {film.mean():.6f} "
                  f"(shift {abs(film - prev).max():.2e} max abs)")
        else:
            print(f"{name}: mean {film.mean():.6f} (new)")


if __name__ == "__main__":
    main()
