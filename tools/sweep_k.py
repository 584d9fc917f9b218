"""Sweep treelet size K for the BVH intersector on a mesh scene (TPU).

Run: python tools/sweep_k.py [scene.toml] [K ...]
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
REPEAT = 10


def main():
    cache = REPO / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from lumillyrender_tpu.ops import rng
    from lumillyrender_tpu.ops.intersect import intersect_bvh
    from lumillyrender_tpu.scene.compiler import compile_scene_file
    from lumillyrender_tpu.accel.pack import build_tri_bvh
    from lumillyrender_tpu.scene.data import Bvh

    args = sys.argv[1:]
    scene_path = Path(args[0]) if args else REPO / "assets" / "sample.toml"
    ks = [int(a) for a in args[1:]] or [16, 32, 64, 128]

    compiled = compile_scene_file(scene_path, spp=1)
    scene = compiled.data
    g = scene.geometry
    import numpy as np

    p0 = np.asarray(g.tri_p0)
    e1 = np.asarray(g.tri_e1)
    e2 = np.asarray(g.tri_e2)
    print(f"scene: {scene_path.name} tris={p0.shape[0]} lanes={N}")

    lane = jnp.arange(N, dtype=jnp.uint32)
    u1, u2 = rng.uniform2(0, lane, 1)
    o = jnp.broadcast_to(scene.camera.position, (N, 3)) + 0.0
    z = u1 * 2.0 - 1.0
    phi = u2 * 6.2831853
    zs = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    d = jnp.stack([zs * jnp.cos(phi), zs * jnp.sin(phi), z], axis=-1)
    d = d + 2.0 * jnp.broadcast_to(scene.camera.forward, (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    ref = None
    for k in ks:
        t0 = time.monotonic()
        bvh = Bvh(**{kk: jnp.asarray(v) for kk, v in build_tri_bvh(p0, e1, e2, max_leaf=k).items()})
        t_build = time.monotonic() - t0

        def run(dd):
            def step(c, _):
                dd, acc = c
                h = intersect_bvh(dd, d, g, bvh)
                return (dd + 1e-6, acc + h.t), None

            (dd, acc), _ = jax.lax.scan(step, (dd, jnp.zeros(N)), None, length=REPEAT)
            return acc

        f = jax.jit(run)
        out = f(o)
        jax.block_until_ready(out)
        t0 = time.monotonic()
        out = f(o)
        jax.block_until_ready(out)
        dt = (time.monotonic() - t0) / REPEAT
        nodes = bvh.node_min.shape[0]
        blocks = bvh.blk_p0.shape[0]
        h = intersect_bvh(o, d, g, bvh)
        chk = float(jnp.sum(jnp.where(h.t < 1e5, h.t, 0.0)))
        if ref is None:
            ref = chk
        print(
            f"K={k:4d} nodes={nodes:7d} blocks={blocks:6d} build={t_build:6.2f}s "
            f"  {dt * 1e3:8.2f} ms/iter  {N / dt / 1e6:7.1f} Mlanes/s  "
            f"checksum={'OK' if abs(chk - ref) < 1e-2 * abs(ref) else f'{chk} vs {ref}'}"
        )


if __name__ == "__main__":
    main()
