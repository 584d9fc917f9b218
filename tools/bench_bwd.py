"""Measure fwd+bwd train-step throughput across remat policies.

Round-3 verdict item #3: halve the fwd-vs-fwd+bwd gap again. The gap's
named components were (a) the per-bounce remat recomputing the shading
chain, (b) fixed-length scans, (c) compaction-permutation backward
gathers, (d) the smaller wavefront. This tool attacks (a): it times the
full 256^2 x 4 spp train step (differentiable render + L2 loss + grads
for every material/camera/sky parameter — bench.py's exact methodology)
under each `RenderSettings.bwd_remat` policy and records the winner in
BWD_REMAT.json. BASELINE.md documents the outcome; the shipped default is
the measured winner.

Run on the TPU host: python tools/bench_bwd.py
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

    from lumillyrender_tpu.scene.compiler import compile_scene_file
    from lumillyrender_tpu.scene.loader import parse_config
    from lumillyrender_tpu.scene.compiler import compile_scene
    from lumillyrender_tpu.diff.render import params_of, render_diff

    compiled = compile_scene_file(REPO / "assets" / "new-cbox.toml", spp=64)
    base = dataclasses.replace(
        compiled.settings, width=RESOLUTION, height=RESOLUTION
    )
    scene = compiled.data
    params = params_of(scene)
    target = jnp.zeros((RESOLUTION, RESOLUTION, 3), jnp.float32)

    # Per-family rows (round-5): the same flagship geometry with the two
    # Lambert spheres swapped for GGX — trains through the HYBRID step
    # (fused Pallas fwd + XLA-vjp bwd) vs the pure-XLA autodiff path.
    ggx_toml = (REPO / "assets" / "new-cbox.toml").read_text().replace(
        """[[material]]
name = "white"
type = "lambert"
albedo = [0.740063, 0.742313, 0.733934]""",
        """[[material]]
name = "white"
type = "ggx"
reflectance = [0.740063, 0.742313, 0.733934]
roughness = 0.35
ior = 14""",
    )
    ggx_compiled = compile_scene(
        parse_config(ggx_toml, base_dir=REPO / "assets"), spp=64
    )
    ggx_scene = ggx_compiled.data
    ggx_base = dataclasses.replace(
        ggx_compiled.settings, width=RESOLUTION, height=RESOLUTION
    )

    # XLA-autodiff path variants (fused="off") plus the hand-VJP fused
    # Pallas path ("fused-hand-vjp", Lambert scenes; bwd_remat is bypassed
    # there — the custom VJP needs no remat at all) plus the GGX hybrid.
    variants = [
        (m, scene,
         dataclasses.replace(base, bwd_remat=m, fused="off"))
        for m in ("isect", "isect+samp", "none", "full", "hybrid")
    ]
    variants.append(
        ("fused-hand-vjp", scene, dataclasses.replace(base, fused="auto"))
    )
    variants.append(
        ("ggx-xla-full", ggx_scene,
         dataclasses.replace(ggx_base, bwd_remat="full", fused="off"))
    )
    variants.append(
        ("ggx-fused-hybrid", ggx_scene,
         dataclasses.replace(ggx_base, fused="auto"))
    )
    results = {}
    for mode, scene, settings in variants:
        params = params_of(scene)

        @partial(jax.jit, static_argnames=())
        def train_step(scene, params, seed, settings=settings):
            def loss_fn(p):
                film, rays = render_diff(
                    scene, settings, p, seed, BWD_SPP, with_rays=True
                )
                return jnp.mean((film - target) ** 2), rays

            (loss, rays), grads = jax.value_and_grad(
                loss_fn, has_aux=True, allow_int=True
            )(params)
            gsum = sum(
                jnp.sum(jnp.abs(g))
                for g in jax.tree_util.tree_leaves(grads)
                if g.dtype != jax.dtypes.float0
            )
            return loss + 0.0 * gsum, rays

        t0 = time.monotonic()
        try:
            loss, rays = train_step(scene, params, 100)
            float(loss)
        except Exception as e:  # e.g. OOM for "none"
            results[mode] = {"error": str(e)[:200]}
            print(f"{mode}: FAILED ({str(e)[:80]})")
            continue
        compile_s = time.monotonic() - t0
        for i in range(3):  # settle (amortize tunnel dispatch)
            loss, rays = train_step(scene, params, 90 + i)
        float(loss)
        t0 = time.monotonic()
        pend = []
        for i in range(STEPS):
            loss, rays = train_step(scene, params, 101 + i)
            pend.append((loss, rays))
        total_rays = sum(float(r) for _, r in pend)
        float(pend[-1][0])
        dt = time.monotonic() - t0
        results[mode] = {
            "rays_per_s": total_rays / dt,
            "step_ms": dt / STEPS * 1e3,
            "compile_s": compile_s,
        }
        print(f"{mode}: {total_rays/dt/1e6:.1f} M rays/s "
              f"({dt/STEPS*1e3:.0f} ms/step, compile {compile_s:.0f}s)")

    (REPO / "BWD_REMAT.json").write_text(json.dumps(results, indent=1))
    print("wrote BWD_REMAT.json")


if __name__ == "__main__":
    main()
