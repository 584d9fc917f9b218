"""Render driver: wavefront batching, film accumulation, throughput stats.

Replaces the reference's per-pixel threadpool + mpsc channel (`main.rs:60-132`)
with jitted wavefront launches: lane = (sample, pixel), chunked over samples
to bound memory; the film is accumulated on-device and divided by spp at the
end. The Monte Carlo estimator matches `main.rs:92-121`:
  pixel = mean_spp( L * g_term * sensitivity / pdf ).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import camera as camera_ops
from ..ops import rng
from ..scene.compiler import CompiledScene
from ..scene.data import RenderSettings, SceneData
from .wavefront import trace


def render_chunk_impl(scene: SceneData, settings: RenderSettings, seed,
                      sample_offset: int, spp_chunk: int):
    """Render `spp_chunk` samples for every pixel; returns (film_sum, rays)."""
    w, h = settings.width, settings.height
    n = w * h * spp_chunk
    lane = jnp.arange(n, dtype=jnp.uint32)
    # Lane ids must be globally unique across chunks for RNG decorrelation.
    glane = lane + jnp.uint32(sample_offset * w * h)

    px = (lane % w).astype(jnp.int32)
    py = ((lane // w) % h).astype(jnp.int32)

    # High counters so they never collide with bounce-loop slots.
    u, v = rng.uniform2(seed, glane, 0x40000000)
    u2, v2 = rng.uniform2(seed, glane, 0x40000001)
    o, d, pdf, g = camera_ops.sample_rays(
        scene.camera, settings.camera_kind, px, py, w, h, u, v, u2, v2
    )

    radiance, rays = trace(scene, settings, o, d, glane, seed)
    weight = (g * scene.camera.sensor_sensitivity / pdf)[..., None]
    contrib = radiance * weight
    film = jnp.sum(contrib.reshape(spp_chunk, h, w, 3), axis=0)
    return film, rays + jnp.float32(n)  # camera rays count too


_render_chunk = jax.jit(
    render_chunk_impl, static_argnames=("settings", "spp_chunk", "sample_offset")
)


@dataclass
class RenderResult:
    film: np.ndarray  # (H, W, 3) float32, radiance (pre tone map)
    seconds: float
    rays: float

    @property
    def rays_per_second(self) -> float:
        return self.rays / max(self.seconds, 1e-9)


def default_spp_chunk(settings: RenderSettings, budget_lanes: int = 1 << 21) -> int:
    per_sample = settings.width * settings.height
    return max(1, min(settings.spp, budget_lanes // max(per_sample, 1)))


def render(compiled: CompiledScene, seed: int = 0, spp_chunk: int | None = None,
           progress: bool = False) -> RenderResult:
    settings = compiled.settings
    scene = compiled.data
    if spp_chunk is None:
        spp_chunk = default_spp_chunk(settings)

    film = jnp.zeros((settings.height, settings.width, 3), jnp.float32)
    total_rays = 0.0
    t0 = time.monotonic()
    done = 0
    while done < settings.spp:
        cur = min(spp_chunk, settings.spp - done)
        part, rays = _render_chunk(scene, settings, seed, done, cur)
        film = film + part
        total_rays += float(rays)
        done += cur
        if progress:
            print(f"\r  {done}/{settings.spp} spp", end="", flush=True)
    film.block_until_ready()
    seconds = time.monotonic() - t0
    if progress:
        print()
    return RenderResult(
        film=np.asarray(film) / settings.spp, seconds=seconds, rays=total_rays
    )
