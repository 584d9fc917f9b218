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
from .wavefront import trace_film


TILE = 32  # max camera-lane tile side (packet coherence for BVH kernels)


def _pow2_tile(dim: int) -> int:
    t = 1
    while t < TILE and dim % (t * 2) == 0:
        t *= 2
    return t


def tile_decode(settings: RenderSettings):
    """Lane-within-image -> (px, py) mapping, or None for raster order.

    Consecutive camera lanes form tw x th pixel tiles (largest powers of 2
    dividing the film dims, up to 32): a 1024-ray packet then covers a
    compact image region instead of 4+ full rows, which tightens the
    Pallas packet kernel's traversal union — measured 6.1x on the 82k-tri
    mesh (tools/probe_tile_order.py: 40.8 vs 6.6 M rays/s at 512^2).
    Films whose dims don't yield at least an 8x8 tile keep raster order
    (tiny/odd films — also what the committed goldens pin).
    """
    w, h = settings.width, settings.height
    tw, th = _pow2_tile(w), _pow2_tile(h)
    if tw * th < 64:
        return None

    def decode(j):
        j = j.astype(jnp.int32)
        tiles_per_row = w // tw
        tile = j // (tw * th)
        within = j % (tw * th)
        px = (tile % tiles_per_row) * tw + within % tw
        py = (tile // tiles_per_row) * th + within // tw
        return px, py

    return decode


def render_chunk_impl(scene: SceneData, settings: RenderSettings, seed,
                      sample_offset, spp_chunk: int):
    """Render `spp_chunk` samples for every pixel; returns (film_sum, rays).

    `sample_offset` is traced (not static): chunked renders reuse one
    compiled program."""
    w, h = settings.width, settings.height
    n = w * h * spp_chunk
    lane = jnp.arange(n, dtype=jnp.uint32)
    # Lane ids must be globally unique across chunks for RNG decorrelation.
    glane = lane + jnp.asarray(sample_offset, jnp.uint32) * jnp.uint32(w * h)

    decode = tile_decode(settings)
    if decode is None:
        px = (lane % w).astype(jnp.int32)
        py = ((lane // w) % h).astype(jnp.int32)
    else:
        px, py = decode(lane % jnp.uint32(w * h))

    from ..ops import pallas_bounce

    force_fused = getattr(settings, "fused", "auto") == "on"
    if (
        pallas_bounce.raygen_supported(settings)
        and n % pallas_bounce.PACKET == 0
        and (pallas_bounce.on_tpu() or force_fused)
    ):
        # Fused Pallas ray generation (pinhole / thin-lens / realistic
        # pinhole; tiled pow2 or raster films): bit-identical RNG + camera
        # math, no lane arrays materialized.
        o, d, g_pl = pallas_bounce.generate_rays(
            scene, settings, seed, sample_offset, n,
            interpret=not pallas_bounce.on_tpu(),
        )
        if g_pl is None:
            pdf = g = jnp.ones((n,), jnp.float32)
        else:
            # Finite-aperture constant pdf (`camera.rs:411-445`); the
            # per-lane geometry term comes from the kernel.
            cam = scene.camera
            pdf_s = 1.0 / (
                cam.sensor_size[0] * cam.sensor_size[1] / (w * h)
            )
            pdf_a = 1.0 / (jnp.pi * cam.aperture_radius**2)
            pdf = jnp.full((n,), pdf_s * pdf_a, jnp.float32)
            g = g_pl
    else:
        # High counter so it never collides with bounce-loop slots.
        u, v, u2, v2 = rng.uniform4(seed, glane, 0x40000000)
        o, d, pdf, g = camera_ops.sample_rays(
            scene.camera, settings.camera_kind, px, py, w, h, u, v, u2, v2
        )

    pixel_fn = None
    if decode is not None:
        def pixel_fn(lane_vals):
            px_, py_ = decode(
                (lane_vals % jnp.uint32(w * h)).astype(jnp.int32)
            )
            return py_ * w + px_

    if settings.integrator in ("normal", "depth"):
        from .wavefront import aov

        val = aov(scene, settings, o, d)
        pix = (py * w + px).astype(jnp.int32)
        film = jnp.zeros((w * h, 3), val.dtype).at[pix].add(val)
        return film.reshape(h, w, 3), jnp.float32(n)

    weight = g * scene.camera.sensor_sensitivity / pdf
    film_flat, rays = trace_film(
        scene, settings, o, d, glane, seed, weight, n_pixels=w * h,
        pixel_fn=pixel_fn,
    )
    return film_flat.reshape(h, w, 3), rays + jnp.float32(n)  # + camera rays


_render_chunk = jax.jit(
    render_chunk_impl, static_argnames=("settings", "spp_chunk")
)


def _render_chunk_acc_impl(scene, settings, seed, sample_offset, film,
                           spp_chunk: int):
    part, rays = render_chunk_impl(scene, settings, seed, sample_offset,
                                   spp_chunk)
    return film + part, rays


# Film accumulator is DONATED: the film sum updates in place on device and
# the chunk-add rides inside the compiled program (one dispatch per chunk —
# dispatch costs ~28 ms over the axon tunnel, so the fold matters).
_render_chunk_acc = jax.jit(
    _render_chunk_acc_impl,
    static_argnames=("settings", "spp_chunk"),
    donate_argnums=(4,),
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
           progress: bool = False, checkpoint: str | None = None,
           checkpoint_every: int = 0, telemetry=None) -> RenderResult:
    """Render the film. With `checkpoint`, the film sum + sample counter are
    periodically persisted and a matching checkpoint resumes exactly
    (counter-based RNG; see utils/checkpoint.py)."""
    settings = compiled.settings
    scene = compiled.data
    if spp_chunk is None:
        spp_chunk = default_spp_chunk(settings)

    film = jnp.zeros((settings.height, settings.width, 3), jnp.float32)
    total_rays = 0.0
    done = 0
    if checkpoint:
        from ..utils import checkpoint as ckpt

        state = ckpt.load(checkpoint, settings, seed)
        if state is not None:
            film_sum, done, total_rays = state
            film = jnp.asarray(film_sum)
            if progress:
                print(f"  resumed at {done}/{settings.spp} spp")
    since_ckpt = 0
    t0 = time.monotonic()
    # Chunks are submitted WITHOUT per-chunk host sync (the tunnel costs
    # ~25 ms per round-trip — at ~190 ms/chunk that's a 13% tax): the
    # donated film threads the data dependency, so the device pipelines
    # chunk N+1's launch behind N. Ray counters are synced once at the
    # end. Telemetry mode keeps the per-chunk sync (it times each chunk).
    pending_rays = []
    while done < settings.spp:
        t_chunk = time.monotonic()
        cur = min(spp_chunk, settings.spp - done)
        film, rays = _render_chunk_acc(scene, settings, seed, done, film, cur)
        done += cur
        since_ckpt += cur
        if telemetry is not None:
            chunk_rays = float(rays)  # forces completion (axon sync)
            total_rays += chunk_rays
            telemetry.log(
                "chunk", spp=cur, done=done, rays=chunk_rays,
                seconds=time.monotonic() - t_chunk,
            )
        else:
            pending_rays.append(rays)
        if checkpoint and (since_ckpt >= max(checkpoint_every, spp_chunk)
                           or done >= settings.spp):
            from ..utils import checkpoint as ckpt

            total_rays += sum(float(r) for r in pending_rays)
            pending_rays = []
            ckpt.save(checkpoint, np.asarray(film), done, seed, settings,
                      total_rays)
            since_ckpt = 0
        if progress:
            print(f"\r  {done}/{settings.spp} spp", end="", flush=True)
    total_rays += sum(float(r) for r in pending_rays)
    # device_get forces completion (block_until_ready is unreliable over the
    # axon tunnel backend).
    film_np = np.asarray(film)
    seconds = time.monotonic() - t0
    if progress:
        print()
    return RenderResult(
        film=film_np / max(done, 1), seconds=seconds, rays=total_rays
    )
