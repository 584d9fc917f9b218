"""Large-mesh benchmark: HBM-streaming Pallas traversal at >= 1M triangles.

The resident-table kernel caps at ~200k tris (12 MiB VMEM); the reference
renders arbitrary-size obj scenes bounded only by RAM
(`/root/reference/src/description.rs:164-197`). This bench proves the
streamed kernel keeps such meshes on the fast path: builds a procedural
displaced-terrain mesh (default ~1M tris), fires coherent and incoherent
rays, times streamed-Pallas vs the XLA walk, parity-checks the streamed
kernel per-lane against the XLA walk (its own oracle chain: walk vs brute
is gated in tests/test_bvh.py), and writes BIGMESH.json.

Run ON TPU: python tools/bench_bigmesh.py [--tris 1000000] [--rays 262144]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def make_terrain(n_tris: int, seed: int = 0):
    """Displaced-grid terrain with ~n_tris triangles (2 per cell)."""
    side = max(2, int(np.sqrt(n_tris / 2)))
    rng = np.random.default_rng(seed)
    xs = np.linspace(-10, 10, side + 1)
    zs = np.linspace(-10, 10, side + 1)
    X, Z = np.meshgrid(xs, zs, indexing="ij")
    Y = np.sin(X * 0.7) * np.cos(Z * 0.6) + 0.15 * rng.standard_normal(X.shape)
    V = np.stack([X, Y, Z], axis=-1).astype(np.float32)
    a = V[:-1, :-1].reshape(-1, 3)
    b = V[1:, :-1].reshape(-1, 3)
    c = V[:-1, 1:].reshape(-1, 3)
    d = V[1:, 1:].reshape(-1, 3)
    p0 = np.concatenate([a, b])
    p1 = np.concatenate([b, d])
    p2 = np.concatenate([c, c])
    e1, e2 = p1 - p0, p2 - p0
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    return (p0.astype(np.float32), e1.astype(np.float32),
            e2.astype(np.float32), n.astype(np.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=1_000_000)
    ap.add_argument("--rays", type=int, default=256 * 1024)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke mode (use with small --tris/--rays)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = REPO / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from lumillyrender_tpu.accel.pack import build_tri_bvh
    from lumillyrender_tpu.ops import pallas_bvh
    from lumillyrender_tpu.ops.intersect import intersect_bvh
    from lumillyrender_tpu.scene.data import Bvh, Geometry

    p0, e1, e2, nrm = make_terrain(args.tris)
    nt = p0.shape[0]
    t0 = time.monotonic()
    arrays = build_tri_bvh(p0, e1, e2, tri_n=nrm,
                           tri_mat=np.zeros(nt, np.int32), max_leaf=32)
    build_s = time.monotonic() - t0
    bvh = Bvh(**{k: jnp.asarray(v) for k, v in arrays.items()})
    # Wide-leaf variant (K=128 -> ops/pallas_bvh_wide.py), the layout the
    # scene compiler now picks for meshes past WIDE_MIN_TRIS.
    t0 = time.monotonic()
    arrays_w = build_tri_bvh(p0, e1, e2, tri_n=nrm,
                             tri_mat=np.zeros(nt, np.int32), max_leaf=128)
    build_w_s = time.monotonic() - t0
    bvh_w = Bvh(**{k: jnp.asarray(v) for k, v in arrays_w.items()})
    geom = Geometry(
        tri_p0=jnp.asarray(p0), tri_e1=jnp.asarray(e1),
        tri_e2=jnp.asarray(e2), tri_n=jnp.asarray(nrm),
        tri_mat=jnp.zeros((nt,), jnp.int32),
        sph_c=jnp.zeros((0, 3), jnp.float32),
        sph_r=jnp.zeros((0,), jnp.float32),
        sph_mat=jnp.zeros((0,), jnp.int32),
    )
    node_mb = pallas_bvh.node_vmem_bytes(bvh) / 2**20
    tbl_mb = pallas_bvh.table_vmem_bytes(bvh) / 2**20
    print(f"tris={nt} nodes={bvh.node_miss.shape[0]} "
          f"node_vmem={node_mb:.1f}MiB tables={tbl_mb:.1f}MiB "
          f"build={build_s:.1f}s")
    print(f"resident supported: {pallas_bvh.supported(bvh)}  "
          f"streamed supported: {pallas_bvh.supported_streamed(bvh)}")

    n = args.rays
    rng = np.random.default_rng(1)
    eye = np.array([0.0, 8.0, 30.0], np.float32)
    # Coherent = RASTER-ordered camera rays (consecutive rays hit adjacent
    # points, so each 1024-ray packet covers a tight image tile — the
    # union-traversal packet kernel lives or dies by this ordering).
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
    cases = {
        "coherent": (jnp.asarray(o_coh), jnp.asarray(d_coh)),
        "incoherent": (jnp.asarray(o_inc), jnp.asarray(d_inc)),
    }

    backends = [
        ("wide-sorted", dict(use_pallas=True,
                             pallas_interpret=args.interpret,
                             reorder=True, _bvh=bvh_w)),
        ("wide", dict(use_pallas=True, pallas_interpret=args.interpret,
                      reorder=False, _bvh=bvh_w)),
        ("pallas-sorted", dict(use_pallas=True, pallas_streamed=True,
                               pallas_interpret=args.interpret,
                               reorder=True)),
        ("pallas-streamed", dict(use_pallas=True, pallas_streamed=True,
                                 pallas_interpret=args.interpret,
                                 reorder=False)),
        ("xla-walk", dict()),
    ]

    def chained(kw, d_cur):
        kw = dict(kw)
        bvh_cur = kw.pop("_bvh", bvh)

        def body(carry, _):
            oo, acc = carry
            h = intersect_bvh(oo, d_cur, geom, bvh_cur, **kw)
            return (oo + 1e-6, acc + jnp.sum(jnp.where(h.prim >= 0, h.t, 0.0))), None

        def fn(o):
            (oo, acc), _ = jax.lax.scan(
                body, (o, jnp.float32(0.0)), None, length=args.iters
            )
            return acc

        return jax.jit(fn)

    from lumillyrender_tpu.ops import pallas_bvh_wide

    out = {"tris": int(nt), "rays": int(n), "build_seconds": build_s,
           "node_vmem_mib": node_mb, "wide_build_seconds": build_w_s,
           "wide_table_mib": pallas_bvh_wide.table_vmem_bytes(bvh_w) / 2**20,
           "wide_wsub": pallas_bvh_wide.WSUB, "cases": {}}
    for case, (o, d) in cases.items():
        for name, kw in backends:
            fn = chained(kw, d)
            acc = fn(o)
            float(acc)  # compile + warm
            t0 = time.monotonic()
            acc = fn(o)
            float(acc)
            dt = (time.monotonic() - t0) / args.iters
            mrps = n / dt / 1e6
            out["cases"][f"{case}/{name}"] = {"mrays_per_s": mrps}
            print(f"{case:10s} {name:15s} {mrps:9.2f} M rays/s", flush=True)

        # per-lane parity vs the XLA walk (prim flips only at t-ties;
        # the sort is exact — see intersect_bvh)
        h_w = jax.jit(lambda o, d: intersect_bvh(o, d, geom, bvh))(o, d)
        t_w = np.asarray(h_w.t)
        scale = max(float(np.abs(t_w[np.isfinite(t_w)]).max()), 1.0)
        for pname, pb, pkw in [
            ("streamed", bvh, dict(pallas_streamed=True)),
            ("wide", bvh_w, dict()),
        ]:
            h_s = jax.jit(lambda o, d, _b=pb, _k=pkw: intersect_bvh(
                o, d, geom, _b, use_pallas=True,
                pallas_interpret=args.interpret, **_k))(o, d)
            t_s = np.asarray(h_s.t)
            t_close = np.abs(t_s - t_w) <= 1e-4 * scale
            prim_eq = np.asarray(h_s.prim) == np.asarray(h_w.prim)
            bad = int(((~prim_eq) & ~t_close).sum()
                      + (prim_eq & ~t_close).sum())
            out["cases"][f"{case}/parity_bad_lanes_{pname}"] = bad
            print(f"{case:10s} parity {pname}-vs-walk: bad={bad}",
                  flush=True)
            if bad:
                raise SystemExit(
                    f"BIGMESH PARITY FAILED ({case}/{pname}): {bad} lanes"
                )

    (REPO / "BIGMESH.json").write_text(json.dumps(out, indent=1))
    print("wrote BIGMESH.json")


if __name__ == "__main__":
    main()
