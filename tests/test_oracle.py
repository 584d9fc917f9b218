"""Cross-implementation gates against the independent scalar oracle.

`tools/oracle.py` is a deliberately naive scalar numpy port of the
reference estimator (`/root/reference/src/scene.rs:20-193`,
`main.rs:92-121`, `material/*.rs`) with its own RNG and float64 math —
nothing of the wavefront renderer's code is on its path. These tests close
the correctness-provenance loop BASELINE.md used to caveat: the renderer's
pixel statistics are checked against a genuinely independent
implementation of the whole estimator, per BASELINE config.

Full-power version (more seeds/spp, all configs) lives in
tools/oracle_gate.py and commits ORACLE.json.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from tools import oracle_gate  # noqa: E402

CONFIGS = [
    "pt-spheres",
    "nee-phong-blinn",
    "ggx",
    "mesh-thinlens",
    "ibl-refraction",
    "omni",
]


@pytest.fixture(scope="module")
def scenes(assets_dir):
    return oracle_gate.build_scenes(res=(16, 16), spp=24)


@pytest.mark.parametrize("name", CONFIGS)
def test_oracle_statistical_match(scenes, name):
    """Welch per-pixel z between renderer and oracle seed stacks must look
    like noise, and film means must agree to MC accuracy."""
    r = oracle_gate.run_gate(name, scenes[name], n_seeds=6, workers=1)
    # <=2 of 256 pixels past |z|=5 (null rate ~0), bulk means within 6%.
    assert r["frac_abs_z_gt5"] <= 2 / 256, r
    assert r["frac_untestable"] < 0.45, r
    # The ggx config is dark (mean ~0.05) and dominated by rare glossy
    # highlights, so its film-mean comparison carries ~2x the MC error of
    # the others at this CI budget (at 32^2 x 32spp x 10 seeds it
    # measures 1.8%, ORACLE.json); the per-pixel z-test above is the
    # powered gate there.
    assert r["rel_mean_diff"] < (0.15 if name == "ggx" else 0.06), r


def test_oracle_brdf_eval_parity(scenes):
    """Deterministic check: the vectorized BSDF table eval agrees with the
    oracle's scalar per-material brdf() on random direction pairs, for
    every family present across the gate scenes.

    Excluded lanes: Phong/Blinn back-lobe directions where the repo's
    documented `_pow_clamped` deviation (ops/bsdf.py:98-106) returns 0
    while IEEE pow of a negative base with an integral exponent (what Rust
    `powf` computes, `phong.rs:41-44`) returns a signed value.
    """
    import jax.numpy as jnp

    from lumillyrender_tpu.ops import bsdf as B
    from lumillyrender_tpu.scene.data import MAT_BLINN_PHONG, MAT_PHONG
    from tools.oracle import OracleScene

    rng = np.random.default_rng(7)
    N = 256

    def rand_dir(n):
        v = rng.normal(size=(n, 3))
        return v / np.linalg.norm(v, axis=1, keepdims=True)

    for name, compiled in scenes.items():
        osc = OracleScene(compiled)
        out = rand_dir(N)
        inn = rand_dir(N)
        nrm = rand_dir(N)
        pos = rng.uniform(-300, 300, size=(N, 3))
        for m in range(osc.mat_type.shape[0]):
            g = B.gather(
                compiled.data.materials, jnp.full((N,), m, jnp.int32)
            )
            got = np.asarray(
                B.eval_brdf(
                    g,
                    jnp.asarray(out, jnp.float32),
                    jnp.asarray(inn, jnp.float32),
                    jnp.asarray(nrm, jnp.float32),
                    jnp.asarray(pos, jnp.float32),
                )
            )
            want = np.stack(
                [
                    osc.mat_brdf(m, out[i], inn[i], nrm[i], pos[i])
                    for i in range(N)
                ]
            )
            mask = np.ones(N, bool)
            t = int(osc.mat_type[m])
            if t in (MAT_PHONG, MAT_BLINN_PHONG):
                on = np.where(
                    (np.einsum("ij,ij->i", nrm, out) < 0)[:, None],
                    -nrm,
                    nrm,
                )
                if t == MAT_PHONG:
                    r = (
                        -out
                        + on * 2 * np.einsum("ij,ij->i", out, on)[:, None]
                    )
                    cos = np.einsum("ij,ij->i", r, inn)
                else:
                    h = inn + out
                    h = h / np.linalg.norm(h, axis=1, keepdims=True)
                    cos = np.einsum("ij,ij->i", h, on)
                mask &= cos > 0.0
            err = np.abs(got[mask] - want[mask])
            rel = err / (np.abs(want[mask]) + 1e-5)
            assert rel.max() < 5e-3, (name, m, t, float(rel.max()))
