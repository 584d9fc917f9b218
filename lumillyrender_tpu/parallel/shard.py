"""Multi-chip / multi-host execution: DP over sample batches on a device mesh.

TPU-native replacement for the reference's per-pixel threadpool + mpsc
channel (`main.rs:60-132`, SURVEY §2.2): the wavefront's sample axis is
sharded across all chips with `shard_map` over a 1-D `jax.sharding.Mesh`;
scene/BVH/materials are replicated in HBM (no halo exchange ever), and the
per-chip partial films are reduced with a single `psum` riding ICI. Gradient
all-reduce in the training step is the same `psum` applied to parameter
cotangents. The AOT v5e 2x4 schedule (tools/bench_scaling.py, SCALING.json
"overlap") shows XLA fuses loss+grad reduction into ONE all-reduce at the
step tail: with a KB-scale payload (material/camera/sky rows — there is no
weight matrix in a renderer) its transfer time is immaterial next to the
bounce loop, so collective/compute overlap is a non-factor for this
workload by construction, not by scheduling cleverness.

Multi-host: call `jax.distributed.initialize()` before building the mesh and
the same code spans hosts (DCN between slices). Tests exercise the path on a
virtual 8-device CPU mesh (`tests/conftest.py`).
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..integrator.render import RenderResult
from ..integrator.wavefront import trace_film
from ..ops import camera as camera_ops
from ..ops import rng
from ..scene.compiler import CompiledScene
from ..scene.data import RenderSettings, SceneData


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Multi-host entry point: `jax.distributed.initialize` from explicit
    args or the LLR_COORDINATOR / LLR_NUM_PROCESSES / LLR_PROCESS_ID env
    vars. Returns True if distributed mode was initialized.

    After this, `jax.devices()` spans every host; the same `make_mesh` +
    `shard_map` code below runs unchanged — film/grad psums ride ICI within
    a slice and DCN across slices. Call before any other JAX usage.
    (Exercised cross-process by tests/test_multihost.py on two CPU
    processes x 4 virtual devices.)
    """
    coordinator = coordinator or os.environ.get("LLR_COORDINATOR")
    if not coordinator:
        return False
    num_processes = int(
        num_processes
        if num_processes is not None
        else os.environ["LLR_NUM_PROCESSES"]
    )
    process_id = int(
        process_id if process_id is not None else os.environ["LLR_PROCESS_ID"]
    )
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()  # global across processes after init_distributed
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), ("dp",))


def put_sharded(np_array: np.ndarray, sharding: NamedSharding):
    """Host array -> global sharded device array; works in both single- and
    multi-process mode (each process materializes only its local shards)."""
    return jax.make_array_from_callback(
        np_array.shape, sharding, lambda idx: np_array[idx]
    )


def _chunk_body(scene: SceneData, settings: RenderSettings, seed, offsets):
    """Render one sample-batch per device. offsets: (spp_local,) int32 of
    global sample indices owned by this shard."""
    from ..integrator.render import tile_decode

    w, h = settings.width, settings.height
    spp_local = offsets.shape[0]
    n = w * h * spp_local
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

    sample_idx = offsets[(lane // (w * h)).astype(jnp.int32)]
    glane = lane % jnp.uint32(w * h) + sample_idx.astype(jnp.uint32) * jnp.uint32(w * h)

    u, v, u2, v2 = rng.uniform4(seed, glane, 0x40000000)
    o, d, pdf, g = camera_ops.sample_rays(
        scene.camera, settings.camera_kind, px, py, w, h, u, v, u2, v2
    )
    weight = g * scene.camera.sensor_sensitivity / pdf
    film_flat, rays = trace_film(
        scene, settings, o, d, glane, seed, weight, n_pixels=w * h,
        pixel_fn=pixel_fn,
    )
    return film_flat.reshape(h, w, 3), rays + jnp.float32(n)


def build_sharded_render(mesh: Mesh, settings: RenderSettings, spp_chunk: int):
    """jit a one-chunk sharded render: (scene, seed, offsets) -> (film, rays).

    `offsets` is a (n_devices * spp_per_dev,) int32 array of global sample
    ids, sharded over 'dp'; the returned film is the replicated psum over
    devices — sample-batch DP exactly as SURVEY §2.2 prescribes.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P("dp")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def sharded(scene, seed, offsets):
        film, rays = _chunk_body(scene, settings, seed, offsets)
        return (
            jax.lax.psum(film, "dp"),
            jax.lax.psum(rays, "dp"),
        )

    return jax.jit(sharded)


def build_sharded_train_step(mesh: Mesh, settings: RenderSettings, spp_per_device: int):
    """jit a full sharded training step for inverse rendering.

    (scene, params, target, offsets) -> (loss, grads): every device renders
    its own sample batch differentiably (detached-sampling estimator, see
    diff/render.py), computes the local L2 loss against the replicated
    target and its parameter cotangents; loss and gradients are `psum`-ed
    over ICI — XLA schedules the all-reduce to overlap with the backward
    shading pass. dp/sample-batch sharding; scene + params replicated.
    """
    from ..diff.render import render_diff

    nd = mesh.devices.size

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("dp")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step(scene, params, target, offsets):
        def loss_fn(p):
            film = render_diff(
                scene, settings, p, 0, offsets.shape[0], sample_offsets=offsets
            )
            return jnp.mean((film - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(params)

        def reduce_grad(g):
            if g.dtype == jax.dtypes.float0:  # int leaves (e.g. type_id)
                return g
            return jax.lax.psum(g / nd, "dp")

        return (
            jax.lax.psum(loss / nd, "dp"),
            jax.tree_util.tree_map(reduce_grad, grads),
        )

    return jax.jit(step)


def render_sharded(
    compiled: CompiledScene,
    seed: int = 0,
    n_devices: int | None = None,
    spp_per_device: int | None = None,
) -> RenderResult:
    settings = compiled.settings
    mesh = make_mesh(n_devices)
    nd = mesh.devices.size

    if spp_per_device is None:
        lanes_budget = 1 << 21
        spp_per_device = max(
            1,
            min(
                -(-settings.spp // nd),  # ceil: don't overshoot small spp
                lanes_budget // (settings.width * settings.height),
            ),
        )
    chunk = nd * spp_per_device
    fn = build_sharded_render(mesh, settings, chunk)

    sharding = NamedSharding(mesh, P("dp"))
    film = np.zeros((settings.height, settings.width, 3), np.float32)
    total_rays = 0.0
    t0 = time.monotonic()
    done = 0
    while done < settings.spp:
        # Pad the tail chunk: extra samples are still averaged (slightly
        # lower-variance tail, never biased — every sample is i.i.d.).
        offsets = np.arange(done, done + chunk, dtype=np.int32)
        offsets = put_sharded(offsets, sharding)
        part, rays = fn(compiled.data, seed, offsets)
        film += np.asarray(part)
        total_rays += float(rays)
        done += chunk
    seconds = time.monotonic() - t0
    return RenderResult(film=film / done, seconds=seconds, rays=total_rays)
