"""Device-op breakdown of the diff-path step via jax.profiler + ProfileData.

PROFILE_BWD.json showed fwd-only == fwd+bwd: the hand-VJP backward is free
and the differentiable FORWARD is the whole remaining gap (~125 M rays/s
saturated vs 597 M for the render driver). This script traces a few steps
and aggregates device-plane op durations by name so the slow stage is
identified by evidence.

Run ON TPU: python tools/trace_bwd.py [--spp 16] [--mode fwd|bwd|render]
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--mode", default="fwd",
                    choices=("fwd", "bwd", "render"))
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = REPO / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from lumillyrender_tpu.diff.render import params_of, render_diff
    from lumillyrender_tpu.scene.compiler import compile_scene_file

    compiled = compile_scene_file(REPO / "assets" / "new-cbox.toml", spp=64)
    settings = dataclasses.replace(compiled.settings, width=256, height=256)
    scene = compiled.data
    params = params_of(scene)
    target = jnp.zeros((256, 256, 3), jnp.float32)

    if args.mode == "render":
        from lumillyrender_tpu.integrator.render import render_chunk_impl

        @jax.jit
        def step(seed):
            film, rays = render_chunk_impl(
                scene, settings, seed, 0, spp_chunk=args.spp
            )
            return jnp.sum(film), rays
    else:
        def loss_fn(p, seed):
            film, rays = render_diff(
                scene, settings, p, seed, args.spp, with_rays=True
            )
            return jnp.mean((film - target) ** 2), rays

        if args.mode == "fwd":

            @jax.jit
            def step(seed):
                return loss_fn(params, seed)

        else:

            @jax.jit
            def step(seed):
                (l, r), g = jax.value_and_grad(
                    loss_fn, has_aux=True, allow_int=True
                )(params, seed)
                return l + 0.0 * sum(
                    jnp.sum(jnp.abs(x))
                    for x in jax.tree_util.tree_leaves(g)
                    if x.dtype != jax.dtypes.float0
                ), r

    l, r = step(3)
    float(l)
    for i in range(3):
        l, r = step(4 + i)
    float(l)

    tdir = tempfile.mkdtemp(prefix="llrtrace_")
    t0 = time.monotonic()
    with jax.profiler.trace(tdir):
        pend = [step(10 + i) for i in range(4)]
        float(pend[-1][0])
    wall = (time.monotonic() - t0) / 4
    print(f"{args.mode} spp={args.spp}: {wall * 1e3:.1f} ms/step wall")

    pb = sorted(Path(tdir).rglob("*.xplane.pb"))
    data = jax.profiler.ProfileData.from_file(str(pb[-1]))
    tot = collections.Counter()
    cnt = collections.Counter()
    for plane in data.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                ns = ev.duration_ns
                name = ev.name
                tot[name] += ns
                cnt[name] += 1
    print(f"-- device plane op totals (4 steps), top {args.top} --")
    grand = sum(tot.values())
    for name, ns in tot.most_common(args.top):
        print(f"{ns / 4e6:9.3f} ms/step x{cnt[name] // 4:5d}  "
              f"{100 * ns / max(grand, 1):5.1f}%  {name[:90]}")
    print(f"total device: {grand / 4e6:.1f} ms/step (may double-count "
          f"nested lines)")


if __name__ == "__main__":
    main()
