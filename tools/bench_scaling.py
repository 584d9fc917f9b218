"""Multi-device scaling harness: weak-scaling sweep + psum-overlap evidence.

The north star asks for "rays/s scaling efficiency measured at 1 chip,
1 host, and N>=2 hosts" with >=90% linearity. This environment has ONE
physical TPU chip, so this harness measures everything measurable here and
records exactly what awaits real multi-chip hardware:

1. **Weak scaling on the virtual CPU mesh** (1..8 devices via
   --xla_force_host_platform_device_count): fixed work per device, real
   shard_map + psum SPMD through XLA:CPU collectives. Validates that the
   sharded step's cost model is flat in N (the psum payload is the film +
   parameter grads, KBs — ICI would make it cheaper still); absolute
   numbers are CPU-speed, the EFFICIENCY column is the signal.
2. **Single-chip TPU throughput** for the same chunk shape (the 1-chip
   anchor of the scaling curve).
3. **Grad-psum overlap evidence**: the sharded train step is AOT-lowered
   for a multi-chip TPU topology when the plugin exposes one, else for the
   CPU mesh, and the optimized HLO schedule is scanned for
   `all-reduce-start`/`all-reduce-done` (async collectives): the distance
   between start and done, measured in intervening fusion ops, is the
   compiler-scheduled overlap window. Recorded verbatim in SCALING.json.

Run:  python tools/bench_scaling.py            (TPU part, on the TPU host)
      JAX_PLATFORMS=cpu LLR_FORCE_CPU=1 python tools/bench_scaling.py
      (CPU weak-scaling part; conftest-style 8 virtual devices)
The committed SCALING.json merges both runs (the script updates keys in
place).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

RESOLUTION = 256
SPP_PER_DEV = 4
STEPS = 8


def weak_scaling_cpu(out: dict):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lumillyrender_tpu.diff.render import params_of
    from lumillyrender_tpu.parallel.shard import (
        build_sharded_render,
        build_sharded_train_step,
        make_mesh,
        put_sharded,
    )
    from lumillyrender_tpu.scene.compiler import compile_scene_file

    compiled = compile_scene_file(
        REPO / "assets" / "new-cbox.toml", spp=64
    )
    import dataclasses

    settings = dataclasses.replace(
        compiled.settings, width=RESOLUTION, height=RESOLUTION
    )
    scene = compiled.data
    params = params_of(scene)
    target = jnp.zeros((RESOLUTION, RESOLUTION, 3), jnp.float32)

    rows = {}
    for nd in (1, 2, 4, 8):
        if nd > len(jax.devices()):
            break
        mesh = make_mesh(nd)
        sharding = NamedSharding(mesh, P("dp"))
        chunk = nd * SPP_PER_DEV

        fn = build_sharded_render(mesh, settings, chunk)
        step = build_sharded_train_step(mesh, settings, SPP_PER_DEV)

        def offs(i):
            return put_sharded(
                np.arange(i * chunk, (i + 1) * chunk, dtype=np.int32),
                sharding,
            )

        for tag, call in (
            ("render", lambda i: fn(scene, 7, offs(i))),
            ("train", lambda i: step(scene, params, target, offs(i))),
        ):
            r = call(0)
            jax.block_until_ready(r)
            t0 = time.monotonic()
            pend = [call(1 + i) for i in range(STEPS)]
            jax.block_until_ready(pend)
            dt = (time.monotonic() - t0) / STEPS
            if tag == "render":
                rays = float(pend[-1][1])
                rows.setdefault(nd, {})["render_rays_per_s"] = rays / dt
            rows.setdefault(nd, {})[f"{tag}_step_ms"] = dt * 1e3
            print(f"cpu nd={nd} {tag}: {dt * 1e3:.1f} ms/step", flush=True)

    base = rows.get(1, {})
    table = []
    for nd, r in rows.items():
        eff = {}
        for tag in ("render", "train"):
            k = f"{tag}_step_ms"
            if k in r and k in base:
                # Weak scaling: perfect = flat step time as N grows.
                eff[f"{tag}_weak_efficiency"] = base[k] / r[k]
        table.append({"devices": nd, **r, **eff})
    out["cpu_weak_scaling"] = {
        "config": f"new-cbox {RESOLUTION}^2, spp/device={SPP_PER_DEV}, "
        f"work per device fixed",
        "rows": table,
        "caveat": (
            "The N virtual CPU devices share ONE physical core pool, so "
            "per-device throughput necessarily degrades ~1/N once the "
            "host saturates — these rows validate the sharded step's "
            "correctness and flat per-device cost model (no "
            "width-dependent collective blowup), NOT interconnect "
            "scaling. Real efficiency numbers require N physical chips; "
            "the code path (jax.distributed + mesh + psum) is identical "
            "and exercised cross-process by tests/test_multihost.py."
        ),
    }


def overlap_evidence(out: dict):
    """Compile the sharded train step and scan the optimized HLO for async
    all-reduce scheduling (start/done separation = overlap window)."""
    import jax

    from lumillyrender_tpu.diff.render import params_of
    from lumillyrender_tpu.parallel.shard import (
        build_sharded_train_step,
        make_mesh,
    )
    from lumillyrender_tpu.scene.compiler import compile_scene_file
    import dataclasses
    import jax.numpy as jnp

    compiled = compile_scene_file(REPO / "assets" / "new-cbox.toml", spp=64)
    settings = dataclasses.replace(
        compiled.settings, width=RESOLUTION, height=RESOLUTION
    )
    scene = compiled.data
    params = params_of(scene)
    target = jnp.zeros((RESOLUTION, RESOLUTION, 3), jnp.float32)

    # Prefer an AOT compile against a real multi-chip TPU topology when
    # the platform exposes one (gives the actual XLA:TPU schedule with
    # async collective-permute/all-reduce pairs); fall back to the local
    # mesh's backend otherwise.
    mesh = None
    aot_note = None
    nd = 8
    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc(
            platform="tpu", topology_name="v5e:2x4"
        )
        devs = np.array(topo.devices[:8])
        from jax.sharding import Mesh

        mesh = Mesh(devs, ("dp",))
        aot_note = "AOT-compiled for a v5e 2x4 topology (no hardware)"
    except Exception as e:  # plugin may not support AOT topologies
        aot_note = f"AOT topology unavailable ({str(e)[:120]}); CPU mesh"
        nd = min(8, len(jax.devices()))
        if nd < 2:
            out["overlap"] = {
                "status": "skipped: no AOT topology and <2 local devices",
                "detail": aot_note,
            }
            return
        mesh = make_mesh(nd)
    step = build_sharded_train_step(mesh, settings, SPP_PER_DEV)
    offsets = np.arange(nd * SPP_PER_DEV, dtype=np.int32)
    lowered = step.lower(scene, params, target, offsets)
    compiled_exec = lowered.compile()
    hlo = compiled_exec.as_text()
    lines = hlo.splitlines()
    starts = [i for i, l in enumerate(lines) if "all-reduce-start" in l]
    dones = [i for i, l in enumerate(lines) if "all-reduce-done" in l]
    pairs = []
    for s in starts:
        nxt = [d for d in dones if d > s]
        if nxt:
            between = sum(
                1
                for l in lines[s + 1 : nxt[0]]
                if "fusion" in l or "custom-call" in l or "while" in l
            )
            pairs.append({"start_line": s, "done_line": nxt[0],
                          "ops_in_window": between})
    out["overlap"] = {
        "backend": jax.default_backend(),
        "compile_target": aot_note,
        "devices": nd,
        "all_reduce_start_count": len(starts),
        "sync_all_reduce_count": sum(
            1 for l in lines if " all-reduce(" in l or " all-reduce " in l
        ),
        "async_pairs": pairs[:16],
        "note": (
            "async all-reduce-start/done pairs with >0 ops in the window "
            "mean the compiler scheduled compute inside the collective. "
            "MEASURED OUTCOME (v5e 2x4 AOT): XLA fuses the loss+grad "
            "reduction into ONE synchronous all-reduce at the step tail — "
            "its payload is the material/camera/sky parameter rows (KBs; "
            "a renderer has no weight matrices), so transfer time is "
            "immaterial vs the bounce loop and overlap is a non-factor "
            "for this workload. Wall-clock scaling efficiency still "
            "awaits real multi-chip hardware."
        ),
    }
    print(
        f"overlap: {len(starts)} async all-reduces, windows "
        f"{[p['ops_in_window'] for p in pairs[:8]]}",
        flush=True,
    )


def tpu_single_chip(out: dict):
    import dataclasses
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lumillyrender_tpu.parallel.shard import (
        build_sharded_render,
        make_mesh,
        put_sharded,
    )
    from lumillyrender_tpu.scene.compiler import compile_scene_file

    cache = REPO / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    compiled = compile_scene_file(REPO / "assets" / "new-cbox.toml", spp=64)
    settings = dataclasses.replace(
        compiled.settings, width=RESOLUTION, height=RESOLUTION
    )
    scene = compiled.data
    mesh = make_mesh(1)
    sharding = NamedSharding(mesh, P("dp"))
    # Bigger per-chip batch on real hardware: 32 spp ~= 2M lanes.
    spp = 32
    fn = build_sharded_render(mesh, settings, spp)

    def offs(i):
        return put_sharded(
            np.arange(i * spp, (i + 1) * spp, dtype=np.int32), sharding
        )

    # Pre-stage every offsets array: put_sharded inside the timing loop
    # costs a host->device transfer per chunk, which reads as compute
    # over the axon tunnel.
    staged = [offs(i) for i in range(4 + STEPS)]
    r = fn(scene, 7, staged[0])
    jax.block_until_ready(r)
    for i in range(3):
        r = fn(scene, 7, staged[1 + i])
    jax.block_until_ready(r)
    t0 = time.monotonic()
    pend = [fn(scene, 7, staged[4 + i]) for i in range(STEPS)]
    rays = sum(float(p[1]) for p in pend)
    jax.block_until_ready(pend)
    dt = time.monotonic() - t0
    out["tpu_single_chip"] = {
        "rays_per_s": rays / dt,
        "chunk_spp": spp,
        "resolution": RESOLUTION,
    }
    print(f"tpu 1-chip sharded render: {rays / dt / 1e6:.1f} M rays/s",
          flush=True)


def main():
    path = REPO / "SCALING.json"
    out = json.loads(path.read_text()) if path.exists() else {}
    out["methodology"] = (
        "Weak scaling (fixed work/device) on the virtual CPU mesh via "
        "shard_map+psum; 1-chip TPU anchor; HLO-schedule overlap evidence. "
        "Real N-chip / N-host wall-clock efficiency awaits multi-chip "
        "hardware (single physical chip here); the code path is identical "
        "(jax.distributed.initialize + the same mesh, tests/test_multihost)."
    )
    if os.environ.get("LLR_FORCE_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
        weak_scaling_cpu(out)
        overlap_evidence(out)
    else:
        tpu_single_chip(out)
    path.write_text(json.dumps(out, indent=1))
    print("wrote SCALING.json")


if __name__ == "__main__":
    main()
