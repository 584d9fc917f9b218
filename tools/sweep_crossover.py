"""Measure the brute vs accelerated-intersector crossover -> sets the
`auto` threshold in ops/intersect.py (`_use_brute`).

Sweeps triangle counts with incoherent rays (the renderer's worst case —
bounce/shadow rays) and times nearest-hit through brute and through the
accelerated path `auto` would pick on this backend (Pallas packet kernel on
TPU, XLA walk on CPU).

Two geometry modes (--shape):
  surface (default): a displaced UV-sphere — a structured surface like real
      scene meshes, where BVH pruning works. This sets the threshold.
  soup: i.i.d. gaussian triangles, all overlapping the origin — an
      adversarial lower bound where NO spatial structure exists and the BVH
      can prune almost nothing (brute wins at every size; kept to document
      the bound, not to set the threshold).

Run ON TPU: python tools/sweep_crossover.py [--rays 262144]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=256 * 1024)
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[128, 512, 2048, 8192, 16384, 32768, 65536])
    ap.add_argument("--json", default=None)
    ap.add_argument("--shape", choices=["surface", "soup", "blob"],
                    default="blob")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = REPO / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from lumillyrender_tpu.accel.pack import build_tri_bvh
    from lumillyrender_tpu.ops import pallas_bvh
    from lumillyrender_tpu.ops.intersect import intersect_brute, intersect_bvh
    from lumillyrender_tpu.scene.data import Bvh, Geometry

    N = args.rays
    rng = np.random.default_rng(0)
    on_tpu = pallas_bvh.on_tpu()

    def bounce_rays(p0, e1, e2):
        """Bounce/shadow-like rays: origins ON the mesh surface (random
        triangle points + EPS normal offset), isotropic directions. This is
        the renderer's actual incoherent workload — rays originating far
        from the geometry (the old uniform-box origins) overstate traversal
        depth ~35x for packet kernels and are not what a path tracer
        traces."""
        # SORTED triangle picks: in a real render a packet's 1024 lanes are
        # adjacent pixels, so bounce-ray origins cluster on a small surface
        # patch. Mesh-generation triangle order is spatially coherent, so
        # sorted indices give each packet a contiguous surface patch while
        # keeping the global distribution uniform. (Unsorted origins — a
        # workload no renderer produces — made the packet kernel look 30x
        # worse than its in-scene behavior.)
        ti = np.sort(rng.integers(0, p0.shape[0], size=N))
        u1 = rng.random(N); u2 = rng.random(N)
        mn, mx = np.minimum(u1, u2), np.maximum(u1, u2)
        pt = (p0[ti] * mn[:, None] + (p0[ti] + e1[ti]) * (1 - mx)[:, None]
              + (p0[ti] + e2[ti]) * (mx - mn)[:, None])
        nrm = np.cross(e1[ti], e2[ti])
        nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-12)
        d_np = rng.normal(size=(N, 3)).astype(np.float32)
        d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
        o_np = (pt + 2e-3 * nrm).astype(np.float32)
        return jnp.asarray(o_np), jnp.asarray(d_np)

    def surface_tris(t):
        """Displaced UV-sphere with ~t triangles (structured surface)."""
        nu = max(2, int(np.ceil(np.sqrt(t / 4))))
        nv = max(3, int(np.ceil(t / (2 * nu))))
        th = np.linspace(0, np.pi, nu + 1)
        ph = np.linspace(0, 2 * np.pi, nv + 1)
        T, P = np.meshgrid(th, ph, indexing="ij")
        r = 1.0 + 0.25 * np.sin(3 * T) * np.cos(5 * P)
        x = r * np.sin(T) * np.cos(P)
        y = r * np.sin(T) * np.sin(P)
        z = r * np.cos(T)
        V = np.stack([x, y, z], axis=-1).astype(np.float32)  # (nu+1, nv+1, 3)
        a = V[:-1, :-1].reshape(-1, 3)
        b = V[1:, :-1].reshape(-1, 3)
        c = V[1:, 1:].reshape(-1, 3)
        d_ = V[:-1, 1:].reshape(-1, 3)
        p0 = np.concatenate([a, a], 0)
        p1 = np.concatenate([b, c], 0)
        p2 = np.concatenate([c, d_], 0)
        return p0, (p1 - p0), (p2 - p0)

    def blob_tris(t):
        """Subdivided lumpy icosphere — the same geometry family as the
        committed bunny-substitute asset (tools/make_assets.py), i.e. a
        smooth closed surface like real scene meshes. The displaced
        UV-sphere 'surface' mode turned out unrepresentative (degenerate
        pole fans wreck the SAH tree); this mode sets the threshold."""
        s = max(0, int(round(np.log(max(t, 20) / 20) / np.log(4))))
        phi_ = (1.0 + np.sqrt(5.0)) / 2.0
        verts = np.array(
            [(-1, phi_, 0), (1, phi_, 0), (-1, -phi_, 0), (1, -phi_, 0),
             (0, -1, phi_), (0, 1, phi_), (0, -1, -phi_), (0, 1, -phi_),
             (phi_, 0, -1), (phi_, 0, 1), (-phi_, 0, -1), (-phi_, 0, 1)],
            dtype=np.float64)
        verts /= np.linalg.norm(verts, axis=1, keepdims=True)
        faces = np.array(
            [(0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
             (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
             (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
             (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1)],
            dtype=np.int64)
        for _ in range(s):
            edge_mid = {}
            vlist = list(verts)

            def mid(a, b):
                key = (a, b) if a < b else (b, a)
                if key not in edge_mid:
                    m = vlist[a] + vlist[b]
                    m = m / np.linalg.norm(m)
                    edge_mid[key] = len(vlist)
                    vlist.append(m)
                return edge_mid[key]

            nf = []
            for a, b, c in faces:
                ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
                nf += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
            verts = np.asarray(vlist)
            faces = np.asarray(nf, dtype=np.int64)
        x, y, z = verts[:, 0], verts[:, 1], verts[:, 2]
        bump = (0.10 * np.sin(7 * x + 1.3) * np.cos(5 * y)
                + 0.07 * np.sin(9 * z + 0.5) * np.cos(6 * x + 2.0)
                + 0.05 * np.sin(11 * y + 4.0))
        verts = (verts * (1.0 + bump)[:, None]).astype(np.float32)
        p0 = verts[faces[:, 0]]
        p1 = verts[faces[:, 1]]
        p2 = verts[faces[:, 2]]
        return p0, p1 - p0, p2 - p0

    def room_tris(half=2.5):
        """12 triangles closing a cube around the blob: every reference
        scene is an enclosure, and enclosure is load-bearing for packet
        traversal — escaping rays keep best_t = INF and defeat t-max
        pruning (measured: the same 82k mesh runs 25 M rays/s enclosed vs
        0.3 M open)."""
        c = np.array(
            [[x, y, z] for x in (-half, half) for y in (-half, half)
             for z in (-half, half)], np.float32)
        quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
                 (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
        p0l, p1l, p2l = [], [], []
        for a, b, cc, dd in quads:
            p0l += [c[a], c[a]]
            p1l += [c[b], c[cc]]
            p2l += [c[cc], c[dd]]
        p0 = np.stack(p0l)
        return p0, np.stack(p1l) - p0, np.stack(p2l) - p0

    results = {}
    for t in args.sizes:
        if args.shape == "blob":
            p0, e1, e2 = blob_tris(t)
            rp0, re1, re2 = room_tris()
            p0 = np.concatenate([p0, rp0])
            e1 = np.concatenate([e1, re1])
            e2 = np.concatenate([e2, re2])
            t = p0.shape[0]
        elif args.shape == "surface":
            p0, e1, e2 = surface_tris(t)
            t = p0.shape[0]
        else:
            p0 = (rng.normal(size=(t, 3)) * 1.2).astype(np.float32)
            e1 = (rng.normal(size=(t, 3)) * 0.3).astype(np.float32)
            e2 = (rng.normal(size=(t, 3)) * 0.3).astype(np.float32)
        nrm = np.cross(e1, e2)
        nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
        geom = Geometry(
            tri_p0=jnp.asarray(p0), tri_e1=jnp.asarray(e1),
            tri_e2=jnp.asarray(e2), tri_n=jnp.asarray(nrm),
            tri_mat=jnp.zeros((t,), jnp.int32),
            sph_c=jnp.zeros((0, 3)), sph_r=jnp.zeros((0,)),
            sph_mat=jnp.zeros((0,), jnp.int32),
        )
        arrays = build_tri_bvh(p0, e1, e2, tri_n=nrm,
                               tri_mat=np.zeros(t, np.int32))
        bvh = Bvh(**{k: jnp.asarray(v) for k, v in arrays.items()})
        o, d = bounce_rays(p0, e1, e2)

        REPS = 10

        def timed(inner):
            # lax.scan chain of dependent calls in ONE dispatch — the axon
            # tunnel costs ~28 ms per dispatch, which would swamp the
            # sub-ms compute at small T.
            def body(carry, _):
                oo, acc = carry
                return (oo + 1e-6, acc + jnp.sum(inner(oo).t)), None

            def fn(o):
                (oo, acc), _ = jax.lax.scan(
                    body, (o, jnp.float32(0.0)), None, length=REPS
                )
                return acc

            f = jax.jit(fn)
            s = float(f(o))
            t0 = time.monotonic()
            s = float(f(o))
            return N / ((time.monotonic() - t0) / REPS), s / REPS

        r_brute, s1 = timed(lambda oo: intersect_brute(oo, d, geom))
        r_acc, s2 = timed(
            lambda oo: intersect_bvh(oo, d, geom, bvh, use_pallas=on_tpu)
        )
        assert abs(s1 - s2) / max(abs(s1), 1e-9) < 1e-4, (t, s1, s2)
        results[t] = dict(brute=r_brute, accel=r_acc)
        print(
            f"T={t:6d}: brute {r_brute/1e6:8.2f} M rays/s | "
            f"{'pallas' if on_tpu else 'xla-walk'} {r_acc/1e6:8.2f} M rays/s"
            f"  -> {'BRUTE' if r_brute > r_acc else 'ACCEL'} wins",
            flush=True,
        )

    if args.json:
        Path(args.json).write_text(
            json.dumps({"rays": N, "backend": jax.default_backend(),
                        "shape": args.shape, "results": results}, indent=2)
        )


if __name__ == "__main__":
    main()
