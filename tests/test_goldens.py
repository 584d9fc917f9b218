"""Self-golden regression gate: the BASELINE.json configs rendered at a
fixed seed must reproduce the committed films (tests/goldens/*.npz).

Catches round-over-round estimator regressions that the statistical gates
(which compare against *other estimators*, not against *history*) cannot.
The renders are deterministic (counter-based RNG, fixed CPU mesh); the small
tolerance absorbs XLA fusion/FMA regrouping across compiler versions.

Regenerate deliberately with `python tools/make_goldens.py` when the
estimator is changed ON PURPOSE, and justify the shift in the commit.
"""

import dataclasses
from pathlib import Path

import numpy as np
import pytest

from lumillyrender_tpu.integrator.render import render
from lumillyrender_tpu.scene.compiler import compile_scene_file

GOLDENS = Path(__file__).parent / "goldens"

# Keep in sync with tools/make_goldens.py.
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


@pytest.mark.parametrize("name,w,h,spp", CONFIGS)
def test_matches_golden(assets_dir, name, w, h, spp):
    golden_path = GOLDENS / (Path(name).stem + ".npz")
    assert golden_path.exists(), (
        f"missing golden {golden_path}; run tools/make_goldens.py"
    )
    golden = np.load(golden_path)["film"]

    c = compile_scene_file(assets_dir / name, spp=spp)
    c.settings = dataclasses.replace(c.settings, width=w, height=h)
    film = render(c, seed=SEED).film

    assert film.shape == golden.shape
    scale = max(float(np.abs(golden).max()), 1e-6)
    rel = np.abs(film - golden).max() / scale
    assert rel < 1e-4, f"{name}: max rel diff {rel:.2e} vs committed golden"
