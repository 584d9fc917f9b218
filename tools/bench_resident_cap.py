"""Sweep the resident-table Pallas BVH kernel across table sizes.

Round 4 capped resident tables at 12 MiB VMEM, spilling every larger mesh
(incl. the 163k-tri ridaisai hero scene, 21.5 MiB) onto the ~100x slower
HBM-streamed path. v5e has 128 MiB of VMEM and the resident kernel's other
footprint is tiny (SUB*LANE ray tiles), so this sweep measures how far the
cap can actually go: for each mesh size it runs the resident kernel
(coherent + incoherent rays), parity-checks it against the XLA walk, and
records rays/s. The shipped VMEM_TABLE_BYTES is set from this artifact
(RESIDENT_CAP.json).

Run ON TPU: python tools/bench_resident_cap.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import numpy as np

from bench_bigmesh import make_terrain  # noqa: E402


def main():
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

    n_rays = 256 * 1024
    iters = 5
    results = []
    for want_tris in (100_000, 200_000, 400_000, 700_000):
        p0, e1, e2, nrm = make_terrain(want_tris)
        nt = p0.shape[0]
        t0 = time.monotonic()
        arrays = build_tri_bvh(p0, e1, e2, tri_n=nrm,
                               tri_mat=np.zeros(nt, np.int32), max_leaf=32)
        build_s = time.monotonic() - t0
        bvh = Bvh(**{k: jnp.asarray(v) for k, v in arrays.items()})
        geom = Geometry(
            tri_p0=jnp.asarray(p0), tri_e1=jnp.asarray(e1),
            tri_e2=jnp.asarray(e2), tri_n=jnp.asarray(nrm),
            tri_mat=jnp.zeros((nt,), jnp.int32),
            sph_c=jnp.zeros((0, 3), jnp.float32),
            sph_r=jnp.zeros((0,), jnp.float32),
            sph_mat=jnp.zeros((0,), jnp.int32),
        )
        tbl_mb = pallas_bvh.table_vmem_bytes(bvh) / 2**20
        row = {
            "tris": int(nt),
            "table_mib": tbl_mb,
            "build_s": build_s,
            "resident_admitted": bool(pallas_bvh.supported(bvh)),
        }
        print(f"tris={nt} table={tbl_mb:.1f}MiB", flush=True)
        if not pallas_bvh.supported(bvh):
            results.append(row)
            continue

        rng = np.random.default_rng(1)
        side = int(np.sqrt(n_rays))
        jx = (np.arange(n_rays) % side) / side
        jz = (np.arange(n_rays) // side) / side
        eye = np.array([0.0, 8.0, 30.0], np.float32)
        tgt = np.stack(
            [20 * (jx - 0.5), np.zeros(n_rays), 20 * (jz - 0.5)], axis=1
        ).astype(np.float32)
        d_coh = tgt - eye
        d_coh /= np.linalg.norm(d_coh, axis=1, keepdims=True)
        o_coh = np.broadcast_to(eye, (n_rays, 3)).copy()
        o_inc = (rng.random((n_rays, 3)).astype(np.float32) - 0.5) * np.array(
            [20, 6, 20], np.float32
        )
        d_inc = rng.normal(size=(n_rays, 3)).astype(np.float32)
        d_inc /= np.linalg.norm(d_inc, axis=1, keepdims=True)

        def chained(kw, d_cur):
            def body(carry, _):
                oo, acc = carry
                h = intersect_bvh(oo, d_cur, geom, bvh, **kw)
                return (
                    oo + 1e-6,
                    acc + jnp.sum(jnp.where(h.prim >= 0, h.t, 0.0)),
                ), None

            def fn(o):
                (oo, acc), _ = jax.lax.scan(
                    body, (o, jnp.float32(0.0)), None, length=iters
                )
                return acc

            return jax.jit(fn)

        try:
            for case, o, d in (
                ("coherent", o_coh, d_coh),
                ("incoherent", o_inc, d_inc),
            ):
                o, d = jnp.asarray(o), jnp.asarray(d)
                fn = chained(dict(use_pallas=True, reorder=True), d)
                float(fn(o))
                t0 = time.monotonic()
                float(fn(o))
                dt = (time.monotonic() - t0) / iters
                row[f"{case}_mrays_per_s"] = n_rays / dt / 1e6
                print(f"  {case}: {n_rays / dt / 1e6:.2f} M rays/s",
                      flush=True)
                # parity vs XLA walk
                h_p = jax.jit(
                    lambda o, d: intersect_bvh(o, d, geom, bvh,
                                               use_pallas=True)
                )(o, d)
                h_w = jax.jit(lambda o, d: intersect_bvh(o, d, geom, bvh))(
                    o, d
                )
                t_p, t_w = np.asarray(h_p.t), np.asarray(h_w.t)
                scale = max(float(np.abs(t_w[np.isfinite(t_w)]).max()), 1.0)
                t_close = np.abs(t_p - t_w) <= 1e-4 * scale
                bad = int((~t_close).sum())
                row[f"{case}_parity_bad"] = bad
                if bad:
                    raise SystemExit(
                        f"RESIDENT PARITY FAILED tris={nt} {case}: {bad}"
                    )
        except SystemExit:
            raise
        except Exception as e:
            row["error"] = str(e)[:300]
            print(f"  FAILED: {str(e)[:120]}", flush=True)
        results.append(row)

    (REPO / "RESIDENT_CAP.json").write_text(
        json.dumps({"sweep": results}, indent=1)
    )
    print("wrote RESIDENT_CAP.json")


if __name__ == "__main__":
    main()
