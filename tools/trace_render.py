"""Device-op time shares of a full render — the traversal-bound proof.

Round-4 verdict item 2 asked for sample.toml >= 100 M rays/s / welcome-geo
>= 75 M "or a committed roofline proof they are traversal-bound". The
BVH-fused bounce (make_step_bvh) moved ALL per-bounce glue into the Pallas
program and measured throughput-neutral — evidence the glue was never the
cost. This tool settles it with a profile: it renders a scene under
jax.profiler, aggregates device-plane op durations, and reports the share
spent inside the packet-traversal/bounce kernels vs everything else.
Writes TRAVERSAL_BOUND.json.

Run ON TPU: python tools/trace_render.py [scene ...]
"""

from __future__ import annotations

import collections
import dataclasses
import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def profile_scene(scene_path, fused="off", spp=32):
    import jax

    from lumillyrender_tpu.integrator.render import render
    from lumillyrender_tpu.scene.compiler import compile_scene_file

    c = compile_scene_file(scene_path, spp=spp)
    c = dataclasses.replace(
        c, settings=dataclasses.replace(c.settings, fused=fused)
    )
    r = render(c, seed=3)  # compile + warm
    tdir = tempfile.mkdtemp(prefix="llr_render_trace_")
    t0 = time.monotonic()
    with jax.profiler.trace(tdir):
        r = render(c, seed=4)
    wall = time.monotonic() - t0
    pb = sorted(Path(tdir).rglob("*.xplane.pb"))
    data = jax.profiler.ProfileData.from_file(str(pb[-1]))
    tot = collections.Counter()
    for plane in data.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            # 'XLA Ops' style lines: leaf ops only, no nesting double-count
            if "Ops" not in line.name and "ops" not in line.name:
                continue
            for ev in line.events:
                tot[ev.name] += ev.duration_ns
    if not tot:  # fall back: take the longest line
        for plane in data.planes:
            for line in plane.lines:
                for ev in line.events:
                    tot[ev.name] += ev.duration_ns
    grand = sum(tot.values())
    kern = sum(
        ns
        for name, ns in tot.items()
        if "custom-call" in name or "tpu_custom_call" in name
        or "fusion" not in name and "pallas" in name.lower()
    )
    top = [
        {"op": name[:110], "ms": ns / 1e6, "share": ns / max(grand, 1)}
        for name, ns in tot.most_common(12)
    ]
    return {
        "scene": str(scene_path),
        "fused": fused,
        "spp": spp,
        "wall_s": wall,
        "rays_per_s": r.rays / wall,
        "device_total_ms": grand / 1e6,
        "pallas_kernel_ms": kern / 1e6,
        "pallas_kernel_share": kern / max(grand, 1),
        "top_ops": top,
    }


def main():
    import jax

    cache = REPO / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    scenes = sys.argv[1:] or [
        str(REPO / "assets" / "sample.toml"),
        str(REPO / "assets" / "welcome-geo.toml"),
    ]
    out = []
    for s in scenes:
        for fused in ("off", "auto"):
            r = profile_scene(s, fused=fused)
            print(
                f"{Path(s).name} fused={fused}: "
                f"{r['rays_per_s'] / 1e6:.1f} M rays/s, pallas share "
                f"{100 * r['pallas_kernel_share']:.0f}% of "
                f"{r['device_total_ms']:.0f} ms device",
                flush=True,
            )
            out.append(r)
    (REPO / "TRAVERSAL_BOUND.json").write_text(
        json.dumps({"profiles": out}, indent=1)
    )
    print("wrote TRAVERSAL_BOUND.json")


if __name__ == "__main__":
    main()
