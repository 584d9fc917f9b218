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

    def bench_fwd(name, scene_file, width, height, spp, reps=12, **overrides):
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
        # Steady state: pipeline the reps (a per-rep float() sync would pay
        # the ~25 ms tunnel dispatch every chunk) and settle first.
        for i in range(3):
            film, rays = fn(compiled.data, 90 + i, 0)
        sync(film)
        t0 = time.monotonic()
        pend = []
        for i in range(reps):
            film, rays = fn(compiled.data, 1 + i, i * spp)
            pend.append(rays)
        total = sum(float(r) for r in pend)
        sync(film)
        dt = time.monotonic() - t0
        results[name] = {
            "rays_per_s": total / dt,
            "seconds_per_chunk": dt / reps,
            "lanes": width * height * spp,
            "compile_s": compile_s,
        }
        print(f"{name}: {total/dt/1e6:.2f} Mrays/s (compile {compile_s:.0f}s)")

    def bench_fwd_bwd(name, scene_file, width, height, spp, reps=12):
        """Full train step (render + L2 loss + material/camera grads).
        Rays counted with the SAME methodology as the forward rows: real
        traced rays (camera + live bounce + NEE shadow), via
        render_diff(with_rays=True)."""
        from functools import partial

        from lumillyrender_tpu.diff.render import params_of, render_diff

        compiled = compile_scene_file(REPO / "assets" / scene_file, spp=spp)
        settings = dataclasses.replace(
            compiled.settings, width=width, height=height
        )
        params = params_of(compiled.data)
        target = jnp.zeros((height, width, 3), jnp.float32)

        @jax.jit
        def train_step(scene, p, seed):
            def loss_fn(pp):
                film, rays = render_diff(
                    scene, settings, pp, seed, spp, with_rays=True
                )
                return jnp.mean((film - target) ** 2), rays

            (loss, rays), grads = jax.value_and_grad(
                loss_fn, has_aux=True, allow_int=True
            )(p)
            gsum = sum(
                jnp.sum(jnp.abs(g))
                for g in jax.tree_util.tree_leaves(grads)
                if g.dtype != jax.dtypes.float0
            )
            return loss + 0.0 * gsum, rays

        t0 = time.monotonic()
        loss, rays = train_step(compiled.data, params, 0)
        sync(loss)
        compile_s = time.monotonic() - t0
        for i in range(3):  # settle
            loss, rays = train_step(compiled.data, params, 90 + i)
        sync(loss)
        t0 = time.monotonic()
        pend = []
        for i in range(reps):
            loss, rays = train_step(compiled.data, params, 1 + i)
            pend.append((loss, rays))
        total = sum(float(r) for _, r in pend)
        sync(pend[-1][0])
        dt = time.monotonic() - t0
        results[name] = {
            "rays_per_s": total / dt,
            "seconds_per_step": dt / reps,
            "lanes": width * height * spp,
            "compile_s": compile_s,
        }
        print(f"{name}: {dt/reps*1000:.0f} ms/step "
              f"({total/dt/1e6:.2f} Mrays/s, compile {compile_s:.0f}s)")

    bench_fwd("new_cbox_fwd_256", "new-cbox.toml", 256, 256, 32)
    bench_fwd("primitive_fwd_256", "primitive.toml", 256, 256, 32)
    bench_fwd("debug_nee_fwd_256", "debug-nee.toml", 256, 256, 32)
    bench_fwd("brdf_ggx_fwd", "brdf.toml", 480, 270, 16)
    bench_fwd("bunny_bvh_fwd_256", "sample.toml", 256, 256, 8)
    # BASELINE config 5: IBL sky + obj meshes at BVH scale + thin lens +
    # NEE, hdr output (assets/welcome-geo.toml).
    bench_fwd("welcome_geo_fwd", "welcome-geo.toml", 256, 184, 8)
    bench_fwd_bwd("new_cbox_fwdbwd_256", "new-cbox.toml", 256, 256, 4)

    out = REPO / "BENCH_DETAIL.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
