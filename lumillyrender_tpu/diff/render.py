"""Differentiable rendering: pixel gradients w.r.t. material & camera params.

The reference has no autodiff anywhere — this is the new capability mandated
by BASELINE.json's north star ("differentiable shading ... gradients w.r.t.
material parameters (albedo, roughness, emission) and camera parameters").

Detached-sampling estimator: all *sampling decisions* (BSDF lobe directions
and pdfs, RR accepts, light picks) are computed from a stop-gradient copy of
the parameters, while the *shading chain* (BRDF values, emission, coef,
cosines, camera ray weights — and the intersection t itself, which carries
geometric derivatives for camera parameters) is evaluated from the live
parameters. With sampling density p fixed at theta0, E[d/dtheta f(x, theta)
/ p(x)] = d/dtheta Int f — unbiased gradients of the rendered image. The
same construction makes finite differences of THIS renderer (same seeds)
agree with autodiff up to FD truncation error, which is the falsifiable test
gate (tests/test_diff.py).

The bounce loop runs as a fixed-length `lax.scan` (reverse-mode safe),
unlike the forward renderer's early-exit `while_loop`.
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..integrator.wavefront import trace_film
from ..ops import camera as camera_ops
from ..ops import rng
from ..scene.data import (
    CameraData,
    MaterialTable,
    RenderSettings,
    SceneData,
    SkyData,
)


class DiffParams(NamedTuple):
    """The differentiable parameter set.

    `sky` includes the IBL texture itself: environment-map gradients flow
    through the equirect nearest-neighbor gather at every miss (the texel
    pick is inherently discrete; given the texel, radiance is linear in it).
    """

    materials: MaterialTable
    camera: CameraData
    sky: SkyData


def params_of(scene: SceneData) -> DiffParams:
    return DiffParams(
        materials=scene.materials, camera=scene.camera, sky=scene.sky
    )


def render_diff(
    scene: SceneData,
    settings: RenderSettings,
    params: DiffParams,
    seed: int,
    spp: int,
    sample_offsets=None,
    params_sample: DiffParams | None = None,
    with_rays: bool = False,
):
    """Differentiable film (H, W, 3) as a function of `params`.

    Sampling decisions use stop_gradient(params); shading uses live params.
    `sample_offsets` (spp,) int32 gives the global sample ids for this call
    (used by the sharded training step to decorrelate devices).
    `params_sample` pins the sampling-decision parameters explicitly — the
    FD-vs-autodiff gate holds the sampling measure fixed on both sides by
    passing theta0 here while FD perturbs only the eval params.
    `with_rays=True` returns (film, rays_traced) — rays counted with the
    same methodology as the forward renderer (camera + live bounce + NEE
    shadow rays), for the fwd+bwd throughput benchmark.
    """
    detached = (
        jax.lax.stop_gradient(params)
        if params_sample is None
        else jax.lax.stop_gradient(params_sample)
    )
    # Scene copy whose material table drives sampling decisions only. The
    # sky is purely part of the shading chain (nothing is sampled from it),
    # so the live sky params go straight in.
    scene_s = replace(
        scene, materials=detached.materials, camera=params.camera,
        sky=params.sky,
    )

    from ..integrator.render import tile_decode

    w, h = settings.width, settings.height
    n = w * h * spp
    lane = jnp.arange(n, dtype=jnp.uint32)
    decode = tile_decode(settings)
    if decode is None:
        px = (lane % w).astype(jnp.int32)
        py = ((lane // w) % h).astype(jnp.int32)
        pixel_fn = None
    else:
        px, py = decode(lane % jnp.uint32(w * h))

        def pixel_fn(lane_vals):
            px_, py_ = decode(
                (lane_vals % jnp.uint32(w * h)).astype(jnp.int32)
            )
            return py_ * w + px_

    if sample_offsets is not None:
        sample_idx = sample_offsets[(lane // (w * h)).astype(jnp.int32)]
        lane = lane % jnp.uint32(w * h) + sample_idx.astype(jnp.uint32) * jnp.uint32(w * h)

    u, v, u2, v2 = rng.uniform4(seed, lane, 0x40000000)
    o, d, pdf, g = camera_ops.sample_rays(
        params.camera, settings.camera_kind, px, py, w, h, u, v, u2, v2
    )
    # Same staged-compaction wavefront as the forward renderer, in its
    # differentiable (checkpointed fixed-scan) mode: the backward pass runs
    # at the compacted widths too, and bounces past all-lanes-dead are
    # skipped by lax.cond in both directions.
    weight = g * params.camera.sensor_sensitivity / pdf
    film_flat, rays = trace_film(
        scene_s,
        settings,
        o,
        d,
        lane,
        seed,
        weight,
        n_pixels=w * h,
        differentiable=True,
        mats_eval=params.materials,
        pixel_fn=pixel_fn,
    )
    film = film_flat.reshape(h, w, 3) / jnp.float32(spp)
    if with_rays:
        return film, rays + jnp.float32(n)  # + camera rays
    return film


@partial(jax.jit, static_argnames=("settings", "spp"))
def film_and_grads(
    scene: SceneData,
    settings: RenderSettings,
    params: DiffParams,
    target: jax.Array,
    seed: int,
    spp: int,
):
    """One inverse-rendering step: L2 loss against `target` plus gradients
    w.r.t. every material/camera parameter."""

    def loss_fn(p):
        film = render_diff(scene, settings, p, seed, spp)
        return jnp.mean((film - target) ** 2), film

    (loss, film), grads = jax.value_and_grad(loss_fn, has_aux=True, allow_int=True)(params)
    return loss, film, grads


def pixel_grad(
    scene: SceneData,
    settings: RenderSettings,
    params: DiffParams,
    seed: int,
    spp: int,
    select,
):
    """Gradient of a scalar pixel functional `select(film)` w.r.t. params —
    the FD-comparison entry point used by the gradient gate tests."""

    def f(p):
        return select(render_diff(scene, settings, p, seed, spp))

    return jax.grad(f, allow_int=True)(params)
