"""Standalone TPU benchmark: Pallas packet kernel vs XLA walk vs brute.

Builds a synthetic mesh (or loads the bunny-substitute asset), fires
coherent camera-like rays and incoherent bounce-like rays, and times
nearest-hit intersection through each backend.

Run ON TPU: python tools/bench_pallas.py [--tris 80000] [--rays 262144]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np


def _force(x):
    return float(jnp.asarray(x).ravel()[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=256 * 1024)
    ap.add_argument("--scene", default="assets/sample.toml")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    cache_dir = REPO / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from lumillyrender_tpu.ops.intersect import (
        intersect_brute,
        intersect_bvh,
    )
    from lumillyrender_tpu.scene.compiler import compile_scene_file

    scene_path = REPO / args.scene
    if not scene_path.exists():
        import subprocess

        subprocess.run(
            [sys.executable, str(REPO / "tools" / "make_assets.py"),
             str(REPO / "assets")],
            check=True,
        )
    compiled = compile_scene_file(scene_path, spp=1)
    geom = compiled.data.geometry
    bvh = compiled.data.bvh
    nt = geom.tri_p0.shape[0]
    k = bvh.blk_p0.shape[1]
    print(f"tris={nt} spheres={geom.sph_c.shape[0]} "
          f"blocks={bvh.blk_p0.shape[0]} K={k} nodes={bvh.node_miss.shape[0]}")
    tables_mb = (bvh.pk_nodes.size + bvh.pk_blk.size + bvh.pk_pm.size) * 4 / 2**20
    print(f"pallas tables: {tables_mb:.1f} MiB")

    n = args.rays
    rng = np.random.default_rng(0)

    # Scene AABB for aiming rays.
    lo = np.asarray(jnp.min(bvh.node_min, axis=0))
    hi = np.asarray(jnp.max(bvh.node_max, axis=0))
    c = (lo + hi) / 2
    ext = float(np.max(hi - lo))

    # Coherent: camera-like grid from one eye point toward jittered targets.
    eye = c + np.array([0.0, 0.0, 2.5 * ext])
    tgt = c + (rng.random((n, 3)) - 0.5) * ext
    d_coh = tgt - eye
    d_coh /= np.linalg.norm(d_coh, axis=1, keepdims=True)
    # sort by pixel-ish order: already coherent by construction
    o_coh = np.broadcast_to(eye, (n, 3)).copy()

    # Incoherent: random origins in the box, random directions.
    o_inc = c + (rng.random((n, 3)) - 0.5) * 1.2 * ext
    d_inc = rng.normal(size=(n, 3))
    d_inc /= np.linalg.norm(d_inc, axis=1, keepdims=True)

    cases = {
        "coherent": (jnp.asarray(o_coh, jnp.float32), jnp.asarray(d_coh, jnp.float32)),
        "incoherent": (jnp.asarray(o_inc, jnp.float32), jnp.asarray(d_inc, jnp.float32)),
    }

    # Each backend is timed as a lax.scan CHAIN of `iters` dependent calls
    # inside ONE jitted dispatch: the axon tunnel costs ~28 ms per dispatch,
    # which would otherwise dominate (and did, in earlier revisions of this
    # bench — the kernel is 3-4x faster than per-call timing suggested).
    def chained(intersector):
        def body(carry, _):
            oo, acc = carry
            h = intersector(oo, d_cur)
            return (oo + 1e-6, acc + jnp.sum(h.t)), None

        def fn(o, d):
            (oo, acc), _ = jax.lax.scan(
                body, (o, jnp.float32(0.0)), None, length=args.iters
            )
            return acc

        return jax.jit(fn)

    backends = [
        ("pallas", lambda o, d: intersect_bvh(o, d, geom, bvh, use_pallas=True)),
        ("pallas+shade", lambda o, d: intersect_bvh(
            o, d, geom, bvh, want_shade=True, use_pallas=True)[0]),
        ("xla-walk", lambda o, d: intersect_bvh(o, d, geom, bvh)),
        ("brute", lambda o, d: intersect_brute(o, d, geom)),
    ]
    results = {}
    for case, (o, d) in cases.items():
        d_cur = d
        for name, inner in backends:
            fn = chained(inner)
            acc = fn(o, d)
            ref = (_force(acc) / args.iters, 0.0)
            t0 = time.monotonic()
            acc = fn(o, d)
            _force(acc)
            dt = (time.monotonic() - t0) / args.iters
            mrps = n / dt / 1e6
            results[(case, name)] = (mrps, ref)
            print(f"{case:10s} {name:13s} {mrps:9.2f} M rays/s   "
                  f"t_sum={ref[0]:.4e}", flush=True)

    # ---- HARD parity gate (on-TPU Mosaic-lowering check) ------------------
    # Per-lane (t, prim, mat, normal) of every backend vs the brute oracle.
    # Lanes whose winner prim differs are only tolerated when the two t's
    # tie within float-contraction noise (FMA regrouping legitimately flips
    # argmin ties); everything else is a real kernel bug and ABORTS.
    from lumillyrender_tpu.ops.intersect import intersect_shade_brute

    parity = {"backend": jax.default_backend(), "tris": int(nt),
              "rays": int(n), "cases": {}}
    shade_backends = [
        ("pallas", lambda o, d: intersect_bvh(
            o, d, geom, bvh, want_shade=True, use_pallas=True)),
        ("xla-walk", lambda o, d: intersect_bvh(
            o, d, geom, bvh, want_shade=True)),
    ]
    failures = []
    for case, (o, d) in cases.items():
        hb, sb = jax.jit(lambda o_, d_: intersect_shade_brute(o_, d_, geom))(o, d)
        tb = np.asarray(hb.t)
        scale = max(float(np.abs(tb[np.isfinite(tb)]).max()), 1.0)
        tol = 1e-4 * scale
        for name, fn in shade_backends:
            h, s = jax.jit(fn)(o, d)
            t = np.asarray(h.t)
            prim_eq = np.asarray(h.prim) == np.asarray(hb.prim)
            t_close = np.abs(t - tb) <= tol
            # prim flips are OK only on t-ties; same-prim lanes must agree
            # on t, material row and normal.
            bad_flip = (~prim_eq) & ~t_close
            nrm_d = np.abs(np.asarray(s.normal) - np.asarray(sb.normal)).max(-1)
            bad_attr = prim_eq & (
                ~t_close
                | (np.asarray(s.mat) != np.asarray(sb.mat))
                | (nrm_d > 1e-4)
            )
            n_bad = int(bad_flip.sum() + bad_attr.sum())
            n_flip = int((~prim_eq).sum())
            parity["cases"][f"{case}/{name}"] = {
                "bad_lanes": n_bad,
                "tie_flips": n_flip,
                "max_rel_t": float(np.abs(t - tb).max() / scale),
            }
            status = "OK" if n_bad == 0 else "FAIL"
            print(f"parity {case:10s} {name:9s}: bad={n_bad} "
                  f"tie_flips={n_flip} {status}", flush=True)
            if n_bad:
                failures.append(f"{case}/{name}: {n_bad} mismatched lanes")

    parity["ok"] = not failures
    out = REPO / "PALLAS_PARITY.json"
    import json

    out.write_text(json.dumps(parity, indent=1))
    print(f"wrote {out}")
    if failures:
        raise SystemExit("PALLAS PARITY FAILED: " + "; ".join(failures))


if __name__ == "__main__":
    main()
