"""Detailed benchmark sweep -> BENCH_DETAIL.json (fills BASELINE.md).

Measures steady-state rays/s/chip forward on the BASELINE.json scene
configs, plus forward+backward (differentiable render with material+camera
gradients) on the flagship. Run manually on the TPU; `bench.py` stays the
driver's single-line entry point.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def sync(x):
    import jax

    return float(jax.numpy.asarray(x).sum())


def main() -> None:
    import jax
    import jax.numpy as jnp

    cache = REPO / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from lumillyrender_tpu.integrator.render import render_chunk_impl
    from lumillyrender_tpu.scene.compiler import compile_scene_file

    results = {}

    def bench_fwd(name, scene_file, width, height, spp, reps=3, **overrides):
        compiled = compile_scene_file(REPO / "assets" / scene_file, spp=spp)
        settings = dataclasses.replace(
            compiled.settings, width=width, height=height, **overrides
        )
        fn = jax.jit(
            lambda scene, seed, off: render_chunk_impl(scene, settings, seed, off, spp)
        )
        t0 = time.monotonic()
        film, rays = fn(compiled.data, 0, 0)
        sync(film)
        compile_s = time.monotonic() - t0
        t0 = time.monotonic()
        total = 0.0
        for i in range(reps):
            film, rays = fn(compiled.data, 1 + i, i * spp)
            total += float(rays)
        sync(film)
        dt = time.monotonic() - t0
        results[name] = {
            "rays_per_s": total / dt,
            "seconds_per_chunk": dt / reps,
            "lanes": width * height * spp,
            "compile_s": compile_s,
        }
        print(f"{name}: {total/dt/1e6:.2f} Mrays/s (compile {compile_s:.0f}s)")

    def bench_fwd_bwd(name, scene_file, width, height, spp, max_bounces=16, reps=3):
        from lumillyrender_tpu.diff.render import film_and_grads, params_of

        compiled = compile_scene_file(REPO / "assets" / scene_file, spp=spp)
        settings = dataclasses.replace(
            compiled.settings, width=width, height=height, max_bounces=max_bounces
        )
        params = params_of(compiled.data)
        target = jnp.zeros((height, width, 3), jnp.float32)
        t0 = time.monotonic()
        loss, film, grads = film_and_grads(
            compiled.data, settings, params, target, 0, spp
        )
        sync(loss)
        compile_s = time.monotonic() - t0
        t0 = time.monotonic()
        for i in range(reps):
            loss, film, grads = film_and_grads(
                compiled.data, settings, params, target, 1 + i, spp
            )
        sync(loss)
        dt = time.monotonic() - t0
        # Nominal rays for the fixed-depth scan: lanes * (bounces + NEE).
        nee = 2 if settings.integrator == "pt-direct" else 1
        rays = width * height * spp * max_bounces * nee * reps
        results[name] = {
            "rays_per_s_nominal": rays / dt,
            "seconds_per_step": dt / reps,
            "lanes": width * height * spp,
            "compile_s": compile_s,
        }
        print(f"{name}: {dt/reps*1000:.0f} ms/step ({rays/dt/1e6:.2f} nominal Mrays/s, compile {compile_s:.0f}s)")

    bench_fwd("new_cbox_fwd_256", "new-cbox.toml", 256, 256, 32)
    bench_fwd("primitive_fwd_256", "primitive.toml", 256, 256, 32)
    bench_fwd("debug_nee_fwd_256", "debug-nee.toml", 256, 256, 32)
    bench_fwd("brdf_ggx_fwd", "brdf.toml", 480, 270, 16)
    bench_fwd("bunny_bvh_fwd_256", "sample.toml", 256, 256, 8)
    # BASELINE config 5: IBL sky + obj meshes at BVH scale + thin lens +
    # NEE, hdr output (assets/welcome-geo.toml).
    bench_fwd("welcome_geo_fwd", "welcome-geo.toml", 256, 184, 8)
    bench_fwd_bwd("new_cbox_fwdbwd_128", "new-cbox.toml", 128, 128, 4)

    out = REPO / "BENCH_DETAIL.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
