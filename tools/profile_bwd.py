"""Per-term accounting of the flagship fwd+bwd train step.

Round-4 verdict: fwd+bwd (90.8 M rays/s, 28 ms/step at 256^2 x 4 spp) is
6.7x off the forward (597.8 M). This tool decomposes the step into
measured terms so the optimization targets (and any irreducible floor) are
evidence, not guesses:

  fwd            loss_fn forward only (same diff-path code, no grad)
  fwd+bwd        jax.value_and_grad of the same (the benchmark step)
  variants       compaction off / shorter bounce ladder / no NEE etc.

Run on the TPU host: python tools/profile_bwd.py [--trace DIR]
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

RESOLUTION = 256
BWD_SPP = 4
STEPS = 12


def main():
    import jax
    import jax.numpy as jnp

    cache = REPO / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from lumillyrender_tpu.diff.render import params_of, render_diff
    from lumillyrender_tpu.scene.compiler import compile_scene_file

    compiled = compile_scene_file(REPO / "assets" / "new-cbox.toml", spp=64)
    base = dataclasses.replace(
        compiled.settings, width=RESOLUTION, height=RESOLUTION
    )
    scene = compiled.data
    params = params_of(scene)
    target = jnp.zeros((RESOLUTION, RESOLUTION, 3), jnp.float32)

    def make_steps(settings):
        def loss_fn(p, seed):
            film, rays = render_diff(
                scene, settings, p, seed, BWD_SPP, with_rays=True
            )
            return jnp.mean((film - target) ** 2), rays

        @jax.jit
        def fwd_step(p, seed):
            return loss_fn(p, seed)

        @jax.jit
        def train_step(p, seed):
            (loss, rays), grads = jax.value_and_grad(
                loss_fn, has_aux=True, allow_int=True
            )(p, seed)
            gsum = sum(
                jnp.sum(jnp.abs(g))
                for g in jax.tree_util.tree_leaves(grads)
                if g.dtype != jax.dtypes.float0
            )
            return loss + 0.0 * gsum, rays

        return fwd_step, train_step

    def bench(fn, tag):
        t0 = time.monotonic()
        loss, rays = fn(params, 100)
        float(loss)
        compile_s = time.monotonic() - t0
        for i in range(4):
            loss, rays = fn(params, 90 + i)
        float(loss)
        t0 = time.monotonic()
        pend = []
        for i in range(STEPS):
            pend.append(fn(params, 101 + i))
        total_rays = sum(float(r) for _, r in pend)
        float(pend[-1][0])
        dt = time.monotonic() - t0
        r = {
            "step_ms": dt / STEPS * 1e3,
            "rays_per_s": total_rays / dt,
            "compile_s": compile_s,
        }
        print(
            f"{tag:34s} {r['step_ms']:7.2f} ms/step "
            f"{r['rays_per_s'] / 1e6:7.1f} M rays/s"
        )
        return r

    out = {}
    variants = [
        ("base", base),
        ("compaction-off", dataclasses.replace(base, compaction="off")),
        ("bounces-24", dataclasses.replace(base, max_bounces=24)),
        ("bounces-12", dataclasses.replace(base, max_bounces=12)),
    ]
    for name, settings in variants:
        fwd_step, train_step = make_steps(settings)
        out[f"{name}/fwd"] = bench(fwd_step, f"{name}/fwd")
        out[f"{name}/fwd+bwd"] = bench(train_step, f"{name}/fwd+bwd")

    if "--trace" in sys.argv:
        tdir = sys.argv[sys.argv.index("--trace") + 1]
        fwd_step, train_step = make_steps(base)
        loss, rays = train_step(params, 55)
        float(loss)
        with jax.profiler.trace(tdir):
            for i in range(4):
                loss, rays = train_step(params, 60 + i)
            float(loss)
        print("trace written to", tdir)

    (REPO / "PROFILE_BWD.json").write_text(json.dumps(out, indent=1))
    print("wrote PROFILE_BWD.json")


if __name__ == "__main__":
    main()
