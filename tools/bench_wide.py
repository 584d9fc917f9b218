"""Micro-bench + parity for the wide-leaf BVH kernel (pallas_bvh_wide).

Sweeps rays/packet (LLR_WIDE_SUB must be set BEFORE import, so this tool
re-execs itself per value) and measures sorted vs unsorted rays on the
1M-tri terrain of bench_bigmesh. Writes/updates WIDE_SWEEP.json.

Run ON TPU: python tools/bench_wide.py [--tris 1000000] [--rays 262144]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))


def run_one(args):
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from bench_bigmesh import make_terrain
    from lumillyrender_tpu.accel.pack import build_tri_bvh
    from lumillyrender_tpu.constants import INF
    from lumillyrender_tpu.ops import pallas_bvh_wide as W
    from lumillyrender_tpu.ops.intersect import _ray_sort_key
    from lumillyrender_tpu.scene.data import Bvh

    p0, e1, e2, nrm = make_terrain(args.tris)
    nt = p0.shape[0]
    arrays = build_tri_bvh(p0, e1, e2, tri_n=nrm,
                           tri_mat=np.zeros(nt, np.int32), max_leaf=128)
    bvh = Bvh(**{k: jnp.asarray(v) for k, v in arrays.items()})
    assert W.supported(bvh), W.table_vmem_bytes(bvh) / 2**20
    tri_n = jnp.asarray(nrm)

    n = args.rays
    rng = np.random.default_rng(1)
    eye = np.array([0.0, 8.0, 30.0], np.float32)
    side = int(np.sqrt(n))
    jx = (np.arange(n) % side) / side
    jz = (np.arange(n) // side) / side
    tgt = np.stack(
        [20 * (jx - 0.5), np.zeros(n), 20 * (jz - 0.5)], axis=1
    ).astype(np.float32)
    d_coh = tgt - eye
    d_coh /= np.linalg.norm(d_coh, axis=1, keepdims=True)
    o_coh = np.broadcast_to(eye, (n, 3)).copy()
    o_inc = (rng.random((n, 3)).astype(np.float32) - 0.5) * np.array(
        [20, 6, 20], np.float32
    )
    d_inc = rng.normal(size=(n, 3)).astype(np.float32)
    d_inc /= np.linalg.norm(d_inc, axis=1, keepdims=True)
    tinit = jnp.full((n,), INF)

    def make_fn(sort):
        def raw(o, d):
            if sort:
                perm = jnp.argsort(_ray_sort_key(o, d, bvh))
                t, prim = W.intersect_tris_wide(
                    jnp.take(o, perm, axis=0), jnp.take(d, perm, axis=0),
                    tinit, bvh, tri_n,
                )
                inv = jnp.argsort(perm)
                t, prim = jnp.take(t, inv), jnp.take(prim, inv)
            else:
                t, prim = W.intersect_tris_wide(o, d, tinit, bvh, tri_n)
            return t, prim

        @jax.jit
        def fn(o, d):
            t, prim = raw(o, d)
            return jnp.sum(jnp.where(prim >= 0, t, 0.0)), jnp.sum(prim >= 0)

        return fn, jax.jit(raw)

    out = {}
    cases = {"coherent": (o_coh, d_coh), "incoherent": (o_inc, d_inc)}
    for sort in (False, True):
        fn, raw = make_fn(sort)
        for case, (o, d) in cases.items():
            o, d = jnp.asarray(o), jnp.asarray(d)
            acc, hits = fn(o, d)
            float(acc)
            t0 = time.monotonic()
            for _ in range(args.iters):
                acc, hits = fn(o, d)
            float(acc)
            dt = (time.monotonic() - t0) / args.iters
            key = f"{case}/{'sorted' if sort else 'plain'}"
            out[key] = round(n / dt / 1e6, 4)
            print(f"WSUB={W.WSUB} {key:22s} {n/dt/1e6:8.3f} M rays/s",
                  flush=True)
    print(json.dumps({f"wsub{W.WSUB}": out}))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=1_000_000)
    ap.add_argument("--rays", type=int, default=256 * 1024)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--wsub", type=str, default="")
    ap.add_argument("--one", action="store_true")
    args = ap.parse_args()

    if args.one:
        run_one(args)
        return

    import subprocess

    results = {}
    for wsub in (args.wsub.split(",") if args.wsub else ["8", "16", "32"]):
        env = dict(os.environ, LLR_WIDE_SUB=wsub)
        cmd = [sys.executable, __file__, "--one", "--tris", str(args.tris),
               "--rays", str(args.rays), "--iters", str(args.iters)]
        r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=1800)
        print(r.stdout)
        if r.returncode:
            print(r.stderr[-2000:])
            continue
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                results.update(json.loads(line))
    (REPO / "WIDE_SWEEP.json").write_text(json.dumps(results, indent=1))
    print("wrote WIDE_SWEEP.json")


if __name__ == "__main__":
    main()
