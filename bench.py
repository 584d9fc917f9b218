"""Benchmark: rays/s/chip on the new-cbox flagship scene (fwd and fwd+bwd).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
`value` is the forward rays/s (the north-star headline, comparable across
rounds); `extra.fwd_bwd_rays_per_second` is the same methodology through a
full value_and_grad training step (render + L2 loss + material/camera
gradients) — BASELINE.json requires both.

The reference publishes no perf numbers (BASELINE.md), so the baseline is
self-established: the first TPU measurement is stored in
`bench_baseline.json` and later rounds report their speedup against it.

Methodology: compile + warm up one chunk, then time repeated render chunks
(jitted, on-device accumulation). "rays" counts every traced ray: camera
rays, bounce rays (live lanes per bounce) and NEE shadow rays — i.e. real
work, not nominal lane-steps.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SPP_CHUNK = 32
# Steady-state windows: the ~25 ms axon-tunnel dispatch latency must be
# amortized over enough queued work or it reads as compute (measured:
# fwd 268 -> 296 M rays/s going 5 -> 20 chunks; fwd+bwd 65 -> 93 M going
# 3 -> 16 steps). Production renders run hundreds of chunks and training
# runs thousands of steps, so steady state is the honest number.
MEASURE_CHUNKS = 20
RESOLUTION = 256
# fwd+bwd is measured at TWO batch sizes: the legacy 4 spp/step (round-3/4
# comparable) and a saturating 16 spp/step. Batch size per optimizer step
# is the practitioner's free parameter — 4 spp leaves the chip
# latency-bound (262k-lane wavefronts against a ~25 ms tunnel dispatch and
# fixed per-scan-step costs); the headline fwd_bwd number is the best of
# the two, with both recorded.
BWD_SPPS = (4, 16)
BWD_STEPS = 16


def main() -> None:
    import dataclasses

    import jax

    # Persistent compilation cache: first-compile over the TPU tunnel costs
    # minutes; cached recompiles are seconds.
    cache_dir = REPO / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from lumillyrender_tpu.integrator.render import _render_chunk
    from lumillyrender_tpu.scene.compiler import compile_scene_file

    scene_path = REPO / "assets" / "new-cbox.toml"
    if not scene_path.exists():
        import subprocess

        subprocess.run(
            [sys.executable, str(REPO / "tools" / "make_assets.py"),
             str(REPO / "assets")],
            check=True,
        )

    compiled = compile_scene_file(scene_path, spp=SPP_CHUNK * MEASURE_CHUNKS)
    compiled.settings = dataclasses.replace(
        compiled.settings, width=RESOLUTION, height=RESOLUTION
    )
    scene, settings = compiled.data, compiled.settings

    # Warm-up: compile + first execution. float() forces completion —
    # block_until_ready is unreliable over the axon tunnel.
    film, rays = _render_chunk(scene, settings, 0, 0, SPP_CHUNK)
    float(film.sum())

    # Chunks pipeline without per-chunk host sync (matching the renderer's
    # driver loop): one final sync after the last chunk.
    t0 = time.monotonic()
    pending = []
    for i in range(MEASURE_CHUNKS):
        film, rays = _render_chunk(scene, settings, 1 + i, i * SPP_CHUNK, SPP_CHUNK)
        pending.append(rays)
    total_rays = sum(float(r) for r in pending)
    float(film.sum())
    seconds = time.monotonic() - t0
    value = total_rays / seconds

    # fwd+bwd: one jitted training step (differentiable render + L2 loss +
    # grads w.r.t. all material/camera params), same ray-count methodology.
    import jax
    import jax.numpy as jnp

    from lumillyrender_tpu.diff.render import params_of, render_diff

    params = params_of(scene)
    target = jnp.zeros((settings.height, settings.width, 3), jnp.float32)

    from functools import partial

    def measure_bwd(bwd_spp: int) -> float:
        @partial(jax.jit, static_argnames=())
        def train_step(scene, params, seed):
            def loss_fn(p):
                film, rays = render_diff(
                    scene, settings, p, seed, bwd_spp, with_rays=True
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

        loss, rays = train_step(scene, params, 100)
        float(loss)  # warm-up + compile
        # Settle: a few pipelined steps drain any tunnel backlog left by
        # the previous phase (measured: skipping this reads 70-82 M where
        # the steady state is 88-96 M).
        settle = [train_step(scene, params, 90 + i)[0] for i in range(4)]
        float(settle[-1])
        # Steps pipeline like a real optimizer loop (params stay on
        # device); one sync after the last step.
        t0 = time.monotonic()
        pend = []
        for i in range(BWD_STEPS):
            loss, rays = train_step(scene, params, 101 + i)
            pend.append((loss, rays))
        bwd_rays = sum(float(r) for _, r in pend)
        # Final sync: pulling the last loss to host forces every queued
        # step to complete (block_until_ready is unreliable over the axon
        # tunnel).
        final_loss = pend[-1][0]
        float(final_loss.sum() if hasattr(final_loss, "sum") else final_loss)
        return bwd_rays / (time.monotonic() - t0)

    bwd_by_spp = {s: measure_bwd(s) for s in BWD_SPPS}
    best_spp = max(bwd_by_spp, key=lambda s: bwd_by_spp[s])
    fwd_bwd_value = bwd_by_spp[best_spp]

    baseline_file = REPO / "bench_baseline.json"
    if baseline_file.exists():
        baseline = json.loads(baseline_file.read_text())["value"]
    else:
        baseline = value
        baseline_file.write_text(
            json.dumps({"metric": "rays_per_second_fwd_new_cbox", "value": value})
        )

    print(
        json.dumps(
            {
                "metric": "rays_per_second_fwd_new_cbox",
                "value": value,
                "unit": "rays/s",
                "vs_baseline": value / baseline,
                "extra": {
                    "fwd_bwd_rays_per_second": fwd_bwd_value,
                    "fwd_bwd_config": (
                        f"{RESOLUTION}^2 x {best_spp} spp full train step"
                    ),
                    "fwd_bwd_by_spp": {
                        str(s): v for s, v in bwd_by_spp.items()
                    },
                },
            }
        )
    )


if __name__ == "__main__":
    main()
