"""CLI driver: `python -m lumillyrender_tpu <scene.toml> [options]`.

Parity: `src/main.rs:43-173` — loads a TOML scene, renders, tone-maps and
writes `images/image_<timestamp>_<spp>.<png|hdr>`. Extra framework flags
(not scene content) are exposed as CLI options, mirroring SURVEY §5.6's
note that framework knobs live outside the scene file.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="lumillyrender_tpu", description=__doc__
    )
    parser.add_argument("scene", help="Path for .toml scene description")
    parser.add_argument("--spp", type=int, default=None, help="Override sample count")
    parser.add_argument(
        "--resolution", type=int, nargs=2, default=None, metavar=("W", "H"),
        help="Override film resolution",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default=None, help="Output file (default images/...)")
    parser.add_argument("--spp-chunk", type=int, default=None)
    parser.add_argument(
        "--intersector", choices=("auto", "brute", "bvh", "pallas"),
        default="auto",
        help="Intersection backend: auto picks brute below the crossover, "
             "then the Pallas packet kernel on TPU (XLA walk elsewhere); "
             "brute/bvh/pallas force a backend (pallas off-TPU runs the "
             "kernel in interpreter mode — slow, for debugging)",
    )
    parser.add_argument(
        "--fused", choices=("auto", "on", "off"), default="auto",
        help="Fused Pallas bounce-step kernel: auto uses it on TPU for "
             "scenes it supports (small prim/light tables, uniform sky); "
             "off forces the XLA bounce step; on forces it even off-TPU "
             "(interpreter mode — slow, for debugging)",
    )
    parser.add_argument("--devices", type=int, default=0,
                        help="Shard across N devices (0 = single device)")
    parser.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                        help="Multi-host: jax.distributed coordinator address "
                             "(with --num-processes/--process-id, or the "
                             "LLR_COORDINATOR/LLR_NUM_PROCESSES/LLR_PROCESS_ID "
                             "env vars)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--aov", choices=("normal", "depth"), default=None,
                        help="Render a debug AOV instead of radiance")
    parser.add_argument("--checkpoint", default=None,
                        help="Checkpoint file: saves film+sample counter; resumes if present")
    parser.add_argument("--checkpoint-every", type=int, default=0,
                        help="Checkpoint every N samples (default: every chunk)")
    parser.add_argument("--telemetry", action="store_true",
                        help="Emit structured per-chunk metrics on stderr")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="Capture a jax.profiler trace into DIR")
    args = parser.parse_args(argv)

    t0 = time.time()
    print(f"start: {time.strftime('%Y-%m-%dT%H:%M:%S%z')}")
    print(f"loading: {args.scene}")

    import jax

    from .parallel.shard import init_distributed

    # Multi-host: must run before any other JAX usage so the coordinator
    # handshake happens ahead of backend initialization.
    distributed = init_distributed(
        args.coordinator, args.num_processes, args.process_id
    )
    if distributed:
        print(
            f"distributed: process {jax.process_index()}/{jax.process_count()}"
            f" ({jax.device_count()} global devices)"
        )

    cache_dir = Path(__file__).resolve().parents[1] / ".jax_cache"
    try:
        cache_dir.mkdir(exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization only

    from .scene.compiler import compile_scene_file

    import dataclasses

    compiled = compile_scene_file(args.scene, spp=args.spp)
    if args.intersector != "auto":
        compiled.settings = dataclasses.replace(
            compiled.settings, intersector=args.intersector
        )
    if args.fused != "auto":
        compiled.settings = dataclasses.replace(
            compiled.settings, fused=args.fused
        )
    if args.resolution:
        compiled.settings = dataclasses.replace(
            compiled.settings, width=args.resolution[0], height=args.resolution[1]
        )
    if args.aov:
        compiled.settings = dataclasses.replace(compiled.settings, integrator=args.aov)
    s = compiled.settings
    print(f"resolution: {s.width}x{s.height}")
    print(f"spp: {s.spp}")
    print(f"integrator: {s.integrator}")
    print(f"polygons: {compiled.stats['polygons']}")
    print(f"bvh construction: {compiled.stats['bvh_seconds']:.3f}s")

    from .utils.telemetry import RenderTelemetry, profiler_trace

    telemetry = RenderTelemetry() if args.telemetry else None
    with profiler_trace(args.profile):
        n_dev = args.devices
        if distributed and not n_dev:
            n_dev = jax.device_count()  # span the whole cluster by default
        if n_dev and n_dev > 1:
            from .parallel.shard import render_sharded

            result = render_sharded(
                compiled, seed=args.seed, n_devices=n_dev
            )
        else:
            from .integrator.render import render

            result = render(
                compiled, seed=args.seed, spp_chunk=args.spp_chunk,
                progress=True, checkpoint=args.checkpoint,
                checkpoint_every=args.checkpoint_every, telemetry=telemetry,
            )
    if telemetry is not None:
        print(json.dumps(telemetry.summary()))

    if distributed and jax.process_index() != 0:
        # Film is replicated; only the coordinator process writes it.
        print(f"rays/s: {result.rays_per_second:.3e}")
        return 0

    print("saving...")
    fmt = compiled.config.film.output
    if args.out:
        out_path = Path(args.out)
    else:
        Path("images").mkdir(exist_ok=True)
        stamp = time.strftime("%Y%m%d%H%M%S")
        out_path = Path("images") / f"image_{stamp}_{s.spp}.{fmt}"

    from .io.image import to_color, write_hdr, write_png

    if fmt == "hdr":
        write_hdr(out_path, result.film)
    elif fmt == "png":
        gamma = compiled.config.film.gamma
        write_png(out_path, to_color(result.film, gamma))
    else:
        raise SystemExit(f"Unsupported output type `{fmt}`")

    print(f"saved: {out_path}")
    print(f"rays/s: {result.rays_per_second:.3e}")
    print(f"elapse: {time.time() - t0:.3f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
