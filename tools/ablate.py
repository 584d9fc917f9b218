"""Ablation microbenchmarks on the real chip: where does a bounce go?

Times, per wavefront lane: RNG draws, brute intersect, BVH intersect,
BSDF sample+eval, NEE block, and the full bounce step — each as a jitted
`lax.scan` over REPEAT iterations so dispatch overhead amortizes.

Run: python tools/ablate.py [scene.toml]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

N = 1 << 18
REPEAT = 20


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    out = f(*args)
    jax.block_until_ready(out)
    dt = (time.monotonic() - t0) / REPEAT
    print(f"{name:28s} {dt * 1e3:9.3f} ms/iter   {N / dt / 1e6:9.1f} Mlanes/s")
    return dt


def scanify(body, init):
    def fn(x):
        def step(c, _):
            return body(c), None

        c, _ = jax.lax.scan(step, x, None, length=REPEAT)
        return c

    return fn, init


def main():
    cache = REPO / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from lumillyrender_tpu.ops import bsdf, rng
    from lumillyrender_tpu.ops.intersect import (
        intersect_brute,
        intersect_bvh,
        shade_point,
    )
    from lumillyrender_tpu.integrator.wavefront import make_bounce_step, PathState
    from lumillyrender_tpu.scene.compiler import compile_scene_file

    scene_path = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "assets" / "new-cbox.toml"
    compiled = compile_scene_file(scene_path, spp=1)
    scene = compiled.data
    settings = compiled.settings
    print(f"scene: {scene_path.name}  tris={scene.geometry.tri_p0.shape[0]}"
          f"  sph={scene.geometry.sph_c.shape[0]}  lanes={N}  repeat={REPEAT}")

    lane = jnp.arange(N, dtype=jnp.uint32)
    u1, u2 = rng.uniform2(0, lane, 1)
    # Rays from roughly the camera toward the scene, randomized direction.
    o = jnp.broadcast_to(scene.camera.position, (N, 3)) + 0.0
    z = u1 * 2.0 - 1.0
    phi = u2 * 6.2831853
    zs = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    d = jnp.stack([zs * jnp.cos(phi), zs * jnp.sin(phi), z], axis=-1)
    fwd = jnp.broadcast_to(scene.camera.forward, (N, 3))
    d = jax.nn.standardize(d + 2.0 * fwd, axis=-1) * 0.0 + (d + 2.0 * fwd)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    # 1. RNG: 5 uniform2 draws per iteration (one bounce's budget).
    def rng_body(c):
        acc, i = c
        s = acc
        for k in range(5):
            a, b = rng.uniform2(7, lane, k)
            s = s + a + b
        return (s, i + 1)

    timeit("rng x5 uniform2", *scanify(rng_body, (jnp.zeros(N), jnp.int32(0))))

    # 2. Brute intersect (rotate direction each iter to defeat CSE).
    def brute_body(c):
        dd, acc = c
        hit = intersect_brute(dd, d, scene.geometry)
        return (dd + 1e-6, acc + hit.t)

    timeit("intersect_brute", *scanify(brute_body, (o, jnp.zeros(N))))

    # 3. BVH intersect.
    if scene.geometry.tri_p0.shape[0] > 0:
        def bvh_body(c):
            dd, acc = c
            hit = intersect_bvh(dd, d, scene.geometry, scene.bvh)
            return (dd + 1e-6, acc + hit.t)

        timeit("intersect_bvh", *scanify(bvh_body, (o, jnp.zeros(N))))

    # 4. BSDF sample + eval on fake hit data.
    hit = intersect_brute(o, d, scene.geometry)
    sp = shade_point(o, d, hit, scene.geometry)
    mats = bsdf.gather(scene.materials, jnp.maximum(sp.mat, 0))

    def bsdf_body(c):
        out, acc = c
        s = bsdf.sample(mats, out, sp.normal, u1, u2, u1)
        f = bsdf.eval_brdf(mats, out, s.direction, sp.normal, sp.position)
        return (out + 1e-6, acc + f * s.pdf[..., None])

    timeit("bsdf sample+eval", *scanify(bsdf_body, (-d, jnp.zeros((N, 3)))))

    # 4b. shade_point alone.
    def shade_body(c):
        dd, acc = c
        h = intersect_brute(dd, d, scene.geometry)
        s = shade_point(dd, d, h, scene.geometry)
        return (dd + 1e-6, acc + s.position * s.normal)

    t_shade = timeit("intersect+shade_point", *scanify(shade_body, (o, jnp.zeros((N, 3)))))

    # 4c. pt-mode bounce step (no NEE) for comparison.
    import dataclasses

    pt_settings = dataclasses.replace(settings, integrator="pt")
    step_pt = make_bounce_step(scene, pt_settings, 0)
    st0 = PathState(
        bounce=jnp.int32(0), o=o, d=d,
        throughput=jnp.ones((N, 3)), accum=jnp.zeros((N, 3)),
        alive=jnp.ones((N,), bool), rays_traced=jnp.float32(0),
        lane=lane,
    )

    def pt_body(s):
        s = step_pt(s)
        return s._replace(bounce=jnp.int32(0), alive=jnp.ones((N,), bool))

    timeit("bounce step (pt, no NEE)", *scanify(pt_body, st0))

    # 5. Full bounce step.
    step = make_bounce_step(scene, settings, 0)
    st = PathState(
        bounce=jnp.int32(0), o=o, d=d,
        throughput=jnp.ones((N, 3)), accum=jnp.zeros((N, 3)),
        alive=jnp.ones((N,), bool), rays_traced=jnp.float32(0),
        lane=lane,
    )

    def full_body(s):
        s = step(s)
        return s._replace(bounce=jnp.int32(0), alive=jnp.ones((N,), bool))

    timeit("full bounce step", *scanify(full_body, st))


if __name__ == "__main__":
    main()
