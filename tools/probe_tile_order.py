"""Probe: does tile-ordering camera lanes speed up the packet kernel?

The Pallas packet kernel traverses the union of its 1024 rays' paths, so
packet spatial coherence is everything. Camera lanes are currently raster
(row-major): at 256 px wide, one packet = 4 full rows (a 256x4 strip).
This probe measures nearest-hit throughput on the 82k-tri sample mesh for
the same camera rays in (a) raster order, (b) 32x32-tile order — deciding
whether the renderer should issue camera lanes tile-ordered.

Run ON TPU: python tools/probe_tile_order.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = REPO / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from lumillyrender_tpu.ops import camera as camera_ops
    from lumillyrender_tpu.ops import rng
    from lumillyrender_tpu.ops.intersect import intersect_bvh
    from lumillyrender_tpu.scene.compiler import compile_scene_file

    c = compile_scene_file(REPO / "assets" / "sample.toml", spp=1)
    scene = c.data
    w = h = 512
    n = w * h
    lane = jnp.arange(n, dtype=jnp.uint32)

    def rays_for(px, py):
        u, v, u2, v2 = rng.uniform4(0, lane, 0x40000000)
        return camera_ops.sample_rays(
            scene.camera, c.settings.camera_kind, px, py, w, h, u, v, u2, v2
        )[:2]

    j = lane.astype(jnp.int32)
    orders = {}
    orders["raster"] = (j % w, j // w)
    T = 32
    tiles_per_row = w // T
    tile_id = j // (T * T)
    within = j % (T * T)
    orders["tile32"] = (
        (tile_id % tiles_per_row) * T + within % T,
        (tile_id // tiles_per_row) * T + within // T,
    )

    for name, (px, py) in orders.items():
        o, d = rays_for(px, py)

        def fn(o, d):
            def body(carry, _):
                oo, acc = carry
                hh = intersect_bvh(oo, d, scene.geometry, scene.bvh,
                                   use_pallas=True)
                return (oo + 1e-6, acc + jnp.sum(hh.t)), None

            (oo, acc), _ = jax.lax.scan(body, (o, jnp.float32(0.0)), None,
                                        length=5)
            return acc

        f = jax.jit(fn)
        float(f(o, d))
        t0 = time.monotonic()
        float(f(o, d))
        dt = (time.monotonic() - t0) / 5
        print(f"{name:8s}: {n/dt/1e6:8.2f} M rays/s", flush=True)


if __name__ == "__main__":
    main()
