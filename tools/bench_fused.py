"""Measure the fused Pallas bounce kernel against the XLA bounce step.

Round-3 verdict demanded this experiment: the roofline said the XLA bounce
step runs at 3.7% of VPU speed-of-light with ~97% of issue slots going to
layout/bookkeeping — an untested 27x-headroom hypothesis. This tool cashes
it in or refutes it on hardware:

  * per-bounce step time at a 2M-lane wavefront (the flagship chunk size),
    XLA vs fused Pallas, on new-cbox (NEE) and primitive (pure pt) —
    measured inside ONE jitted K-iteration loop so the ~25 ms dispatch tax
    doesn't pollute the per-step number;
  * hardware per-lane parity (same exclusion rules as
    tests/test_fused_bounce.py: intersection tie flips and checker-line
    flips from float contraction);
  * end-to-end flagship render throughput with the fused step on vs off.

Writes FUSED_BOUNCE.json. Run on the TPU host: python tools/bench_fused.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

K_STEPS = 16
N_LANES = 1 << 21
SEED = 77


def setup_cache():
    import jax

    cache = REPO / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def make_state(scene, n):
    """Bounce-like wavefront: surface-adjacent origins, isotropic dirs."""
    import jax.numpy as jnp

    from lumillyrender_tpu.integrator.wavefront import PathState

    g = scene.geometry
    pts = []
    if g.tri_p0.shape[0]:
        pts.append(np.asarray(g.tri_p0))
    if g.sph_c.shape[0]:
        pts.append(np.asarray(g.sph_c))
    ref = np.concatenate(pts, axis=0)
    lo, hi = ref.min(axis=0) - 1.0, ref.max(axis=0) + 1.0
    rng = np.random.default_rng(3)
    o = rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return PathState(
        bounce=jnp.int32(1),
        o=jnp.asarray(o),
        d=jnp.asarray(d),
        throughput=jnp.ones((n, 3), jnp.float32),
        accum=jnp.zeros((n, 3), jnp.float32),
        alive=jnp.asarray(rng.random(n) < 0.9),
        rays_traced=jnp.float32(0),
        lane=jnp.arange(n, dtype=jnp.uint32),
    )


def time_step(step, state, k=K_STEPS):
    """Per-step seconds from one jitted k-iteration loop (fixed workload:
    each iteration re-applies the step to the ORIGINAL state, chained only
    through the accum so nothing is dead-code-eliminated)."""
    import jax
    import jax.numpy as jnp

    def many(state):
        def body(i, acc):
            s = state._replace(accum=acc)
            return step(s).accum

        return jax.lax.fori_loop(0, k, body, state.accum)

    f = jax.jit(many)
    out = f(state)
    float(out.sum())  # compile + warm-up
    t0 = time.monotonic()
    reps = 3
    for _ in range(reps):
        out = f(state)
    float(out.sum())
    dt = (time.monotonic() - t0) / (reps * k)
    return dt


def parity(step_a, step_b, state, scene):
    """Hardware per-lane parity with the discontinuity exclusions."""
    import jax
    import jax.numpy as jnp

    from lumillyrender_tpu.ops import bsdf

    sa = jax.jit(step_a)(state)
    sb = jax.jit(step_b)(state)
    oa, ob = np.asarray(sa.o), np.asarray(sb.o)
    scale = np.abs(oa).max() + 1.0
    tie = (np.abs(oa - ob).max(axis=1) / scale) > 1e-3
    ck_a = np.asarray(bsdf.checker(jnp.asarray(oa[:, 0]), jnp.asarray(oa[:, 2])))
    ck_b = np.asarray(bsdf.checker(jnp.asarray(ob[:, 0]), jnp.asarray(ob[:, 2])))
    excl = tie | (ck_a != ck_b)
    keep = ~excl

    def max_rel(a, b):
        a, b = np.asarray(a)[keep], np.asarray(b)[keep]
        return float((np.abs(a - b) / np.maximum(np.abs(a), 1.0)).max())

    # NEE shadow-verdict flips: binary |t - dist| <= EPS decisions exactly
    # on the light surface that float contraction can flip either way
    # (bounded, like tie/checker flips; see tests/test_fused_bounce.py).
    aa, ab = np.asarray(sa.accum)[keep], np.asarray(sb.accum)[keep]
    rel_acc = (np.abs(aa - ab) / np.maximum(np.abs(aa), 1.0)).max(axis=1)
    nee_flip = rel_acc > 2e-3
    return {
        "lanes": int(state.o.shape[0]),
        "tie_flips": int(tie.sum()),
        "checker_flips": int((ck_a != ck_b).sum()),
        "nee_verdict_flips": int(nee_flip.sum()),
        "alive_mismatch_kept": int(
            (np.asarray(sa.alive)[keep] != np.asarray(sb.alive)[keep]).sum()
        ),
        "max_rel_o": max_rel(sa.o, sb.o),
        "max_rel_throughput": max_rel(sa.throughput, sb.throughput),
        "max_rel_accum_nonflip": float(rel_acc[~nee_flip].max()) if (~nee_flip).any() else 0.0,
        "rays_a": float(sa.rays_traced),
        "rays_b": float(sb.rays_traced),
    }


def bench_render(scene_path, fused: str, spp=32, chunks=4, res=256):
    """End-to-end chunked render throughput (bench.py methodology)."""
    import dataclasses

    from lumillyrender_tpu.integrator.render import _render_chunk
    from lumillyrender_tpu.scene.compiler import compile_scene_file

    compiled = compile_scene_file(scene_path, spp=spp * chunks)
    compiled.settings = dataclasses.replace(
        compiled.settings, width=res, height=res, fused=fused
    )
    scene, settings = compiled.data, compiled.settings
    film, rays = _render_chunk(scene, settings, 0, 0, spp)
    float(film.sum())
    t0 = time.monotonic()
    pend = []
    for i in range(chunks):
        film, rays = _render_chunk(scene, settings, 1 + i, i * spp, spp)
        pend.append(rays)
    total = sum(float(r) for r in pend)
    float(film.sum())
    return total / (time.monotonic() - t0)


def main():
    setup_cache()
    import jax

    from lumillyrender_tpu.integrator.wavefront import make_bounce_step
    from lumillyrender_tpu.ops import pallas_bounce
    from lumillyrender_tpu.scene.compiler import compile_scene_file

    out = {"n_lanes": N_LANES, "k_steps": K_STEPS,
           "backend": jax.default_backend()}
    for name in ("new-cbox", "primitive"):
        c = compile_scene_file(REPO / "assets" / f"{name}.toml", spp=1)
        scene, settings = c.data, c.settings
        assert pallas_bounce.supported(scene, settings), name
        state = make_state(scene, N_LANES)
        step_x = make_bounce_step(scene, settings, SEED, allow_fused=False)
        step_p = pallas_bounce.make_step(scene, settings, SEED)
        tx = time_step(step_x, state)
        tp = time_step(step_p, state)
        small = make_state(scene, 1 << 16)
        par = parity(step_x, step_p, small, scene)
        out[name] = {
            "xla_ms_per_bounce": tx * 1e3,
            "fused_ms_per_bounce": tp * 1e3,
            "speedup": tx / tp,
            "xla_mlanes_per_s": N_LANES / tx / 1e6,
            "fused_mlanes_per_s": N_LANES / tp / 1e6,
            "parity_64k": par,
        }
        print(name, json.dumps(out[name]["parity_64k"]))
        print(f"{name}: XLA {tx*1e3:.2f} ms  fused {tp*1e3:.2f} ms  "
              f"({tx/tp:.2f}x)  [{N_LANES/tp/1e6:.0f} Mlanes/s fused]")

    print("end-to-end renders (fused off/on):")
    out["render"] = {}
    for name in ("new-cbox", "primitive", "debug-nee", "brdf"):
        p = REPO / "assets" / f"{name}.toml"
        r_off = bench_render(p, "off")
        r_on = bench_render(p, "auto")
        out["render"][name] = {
            "xla_rays_per_s": r_off,
            "fused_rays_per_s": r_on,
            "speedup": r_on / r_off,
        }
        print(f"  {name}: XLA {r_off/1e6:.1f} -> fused {r_on/1e6:.1f} "
              f"M rays/s ({r_on/r_off:.2f}x)")

    (REPO / "FUSED_BOUNCE.json").write_text(json.dumps(out, indent=1))
    print("wrote FUSED_BOUNCE.json")


if __name__ == "__main__":
    main()
