"""Regression guards for process-level invariants.

1. Importing the package must NOT initialize the XLA backend: the CLI
   `--coordinator` path and the multi-host workers call
   `jax.distributed.initialize()` AFTER `import lumillyrender_tpu`, and JAX
   requires distributed init to precede any backend creation. Round 2
   shipped a module-scope `jnp.float32` constant (ops/rng.py) that broke
   exactly this; this test pins the fix.

2. The threefry reference mixer (LLR_RNG=threefry) must work with a TRACED
   counter: the bounce loop passes `ctr = bounce * K + slot` as a traced
   int32, and a bare `ctr ^ 0x80000000` overflows int32 at trace time.
"""

import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parents[1]


def test_import_does_not_init_xla_backend():
    code = (
        "import lumillyrender_tpu\n"
        "import lumillyrender_tpu.cli\n"
        "import lumillyrender_tpu.integrator.render\n"
        "from jax._src import xla_bridge as xb\n"
        "assert not xb._backends, f'XLA backend initialized at import: {list(xb._backends)}'\n"
    )
    subprocess.run(
        [sys.executable, "-c", code], check=True, cwd=str(REPO), timeout=120
    )


def test_threefry_mixer_traced_counter(monkeypatch):
    from lumillyrender_tpu.ops import rng

    monkeypatch.setattr(rng, "_MIXER", "threefry")
    lane = jnp.arange(64, dtype=jnp.uint32)

    @jax.jit
    def draw(ctr):
        return rng.uniform4(7, lane, ctr)

    ctr = jnp.int32(3 * 32 + 1)  # traced, like the bounce loop's bounce*K+slot
    f = draw(ctr)
    for x in np.asarray(f):
        assert np.all((x >= 0.0) & (x < 1.0))
    # distinct counters decorrelate
    g = draw(jnp.int32(5 * 32 + 1))
    assert not np.allclose(np.asarray(f[0]), np.asarray(g[0]))


def test_bwd_remat_typo_raises():
    """A misspelled bwd_remat policy must error, not silently fall back."""
    import dataclasses

    import multihost_worker
    import pytest

    from lumillyrender_tpu.diff.render import params_of, render_diff
    from lumillyrender_tpu.scene.compiler import compile_scene
    from lumillyrender_tpu.scene.loader import parse_config

    compiled = compile_scene(parse_config(multihost_worker.SCENE))
    settings = dataclasses.replace(
        compiled.settings, bwd_remat="issect", fused="off"
    )
    with pytest.raises(ValueError, match="bwd_remat"):
        render_diff(compiled.data, settings, params_of(compiled.data),
                    seed=3, spp=1)


def test_threefry_mode_renders(monkeypatch):
    """LLR_RNG=threefry end-to-end render smoke (tiny scene)."""
    from lumillyrender_tpu.ops import rng

    monkeypatch.setattr(rng, "_MIXER", "threefry")
    import multihost_worker

    from lumillyrender_tpu.integrator.render import render
    from lumillyrender_tpu.scene.compiler import compile_scene
    from lumillyrender_tpu.scene.loader import parse_config

    compiled = compile_scene(parse_config(multihost_worker.SCENE))
    result = render(compiled, seed=11)
    film = np.asarray(result.film)
    assert np.isfinite(film).all()
    assert film.max() > 0.0
