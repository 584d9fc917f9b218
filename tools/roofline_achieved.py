"""Achieved vs speed-of-light per renderer stage -> markdown for BASELINE.md.

Ceilings come from tools/roofline.py (roofline.json). Achieved numbers come
from jitted stage timings on the real chip; useful-work op counts are
analytic (every VPU add/mul/cmp/select counted as 1 f32 op) so the achieved
fraction states how much of the chip's vector issue rate the stage turns
into intersection/shading math rather than bookkeeping.

All hot tables (geometry, BVH blocks, materials) are VMEM/registers-resident
at flagship sizes and ray-queue HBM traffic per bounce is tiny, so the
binding resource for every stage is VPU f32 issue — the HBM column is
reported to show it is nowhere near binding.

For the Pallas packet kernel the per-packet node/leaf visit counts are
data-dependent; they are counted exactly by a numpy simulation of the same
walk on sample packets, then multiplied by the analytic slab/MT op costs.

Run ON TPU: python tools/roofline_achieved.py [--json FILE]
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

# Analytic per-lane f32 op counts (adds+muls+cmps+selects, divisions=1).
OPS_TRI_MT = 55  # Moller-Trumbore incl. accept mask
OPS_TRI_FOLD = 8  # running-min bookkeeping per tri
OPS_SPH = 28  # quadratic + asymmetric EPS semantics
OPS_SLAB = 30  # AABB slab test + descend logic per node
OPS_BSDF = 260  # measured static count of the 5-branch masked eval+sample
OPS_NEE_LOCAL = 120  # light pick + geometry term + contribution (excl. shadow ray)
OPS_RNG2 = 60  # one threefry uniform2 (2x32-bit draws)
OPS_RNG4 = 36  # one pcg4d uniform4 (4x32-bit draws + float converts)


def _force(x):
    import jax.numpy as jnp

    return float(jnp.asarray(x).ravel()[0])


def timeit_scan(body, init, repeat=20):
    import jax

    def fn(x):
        def step(c, _):
            return body(c), None

        c, _ = jax.lax.scan(step, x, None, length=repeat)
        return c

    f = jax.jit(fn)
    out = f(init)
    jax.block_until_ready(out)
    t0 = time.monotonic()
    out = f(init)
    jax.block_until_ready(out)
    return (time.monotonic() - t0) / repeat


def simulate_packet_walk(bvh, o, d, t_best, packets=8):
    """Exact node/leaf visit counts of the Pallas packet walk (numpy),
    including the best-t tightening by every visited leaf's MT tests (the
    tightening prunes later subtrees, so it changes the counts)."""
    nodes = np.asarray(bvh.pk_nodes)  # (Nn, 8)
    p0 = np.asarray(bvh.blk_p0)
    e1 = np.asarray(bvh.blk_e1)
    e2 = np.asarray(bvh.blk_e2)
    pr = np.asarray(bvh.blk_prim)
    k = p0.shape[1]
    o = np.asarray(o)
    d = np.asarray(d)
    tb = np.asarray(t_best).copy()
    n_nodes = l_visits = 0
    lanes = 1024
    for p in range(packets):
        s = slice(p * lanes, (p + 1) * lanes)
        ox, dx = o[s], d[s]
        best = tb[s].copy()
        with np.errstate(divide="ignore"):
            inv = 1.0 / dx
        cur = 0
        while cur >= 0:
            n_nodes += 1
            row = nodes[cur]
            with np.errstate(invalid="ignore"):
                t0s = (row[0:3] - ox) * inv
                t1s = (row[3:6] - ox) * inv
            tmin = np.minimum(t0s, t1s).max(axis=1)
            tmax = np.maximum(t0s, t1s).min(axis=1)
            ok = (tmin <= tmax) & (tmax >= 1e-3) & (tmin < best)
            anyhit = bool(ok.any())
            leaf = int(row[7])
            if anyhit and leaf >= 0:
                l_visits += 1
                # dense MT of the leaf's K tris vs the packet, tightening t
                b = leaf
                with np.errstate(invalid="ignore", divide="ignore"):
                    pv = np.cross(dx[:, None, :], e2[b][None])  # (n,K,3)
                    det = np.einsum("kc,nkc->nk", e1[b], pv)
                    det_ok = np.abs(det) >= 1e-3
                    invd = np.where(det_ok, 1.0 / np.where(det_ok, det, 1.0), 0.0)
                    tv = ox[:, None, :] - p0[b][None]
                    u = np.einsum("nkc,nkc->nk", tv, pv) * invd
                    qv = np.cross(tv, e1[b][None])
                    v = np.einsum("nc,nkc->nk", dx, qv) * invd
                    t = np.einsum("kc,nkc->nk", e2[b], qv) * invd
                    okk = (
                        det_ok & (u >= 0) & (u <= 1) & (v >= 0)
                        & (u + v <= 1) & (t >= 1e-3) & (pr[b][None] >= 0)
                    )
                t = np.where(okk, t, np.inf).min(axis=1)
                best = np.minimum(best, t.astype(np.float32))
            if anyhit and leaf < 0:
                cur = cur + 1
            else:
                cur = int(row[6])
        tb[s] = best
    return n_nodes / packets, l_visits / packets, k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--rays", type=int, default=1 << 18)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = REPO / ".jax_cache"
    cache.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    ceil = json.loads((REPO / "roofline.json").read_text())
    VPU = ceil["vpu_f32_flops"]
    HBM = ceil["hbm_bytes_per_s"]

    from lumillyrender_tpu.integrator.wavefront import (
        PathState,
        make_bounce_step,
    )
    from lumillyrender_tpu.ops import rng
    from lumillyrender_tpu.ops.intersect import intersect_brute, intersect_bvh
    from lumillyrender_tpu.scene.compiler import compile_scene_file

    N = args.rays
    rows = []

    def add(stage, dt, ops_per_lane, bytes_per_lane, note=""):
        ach = ops_per_lane * N / dt
        hbm = bytes_per_lane * N / dt
        rows.append(
            dict(
                stage=stage,
                ms=dt * 1e3,
                lanes_per_s=N / dt,
                achieved_gflops=ach / 1e9,
                pct_vpu=100 * ach / VPU,
                hbm_gbs=hbm / 1e9,
                pct_hbm=100 * hbm / HBM,
                note=note,
            )
        )
        print(
            f"{stage:26s} {dt*1e3:8.2f} ms  {N/dt/1e6:7.1f} Mlanes/s "
            f"{ach/1e12:6.3f} TFLOP/s = {100*ach/VPU:5.1f}% VPU "
            f"({hbm/1e9:5.1f} GB/s = {100*hbm/HBM:4.1f}% HBM) {note}",
            flush=True,
        )

    # ---- flagship scene (new-cbox): brute path --------------------------
    c = compile_scene_file(REPO / "assets" / "new-cbox.toml", spp=1)
    scene = c.data
    T = scene.geometry.tri_p0.shape[0]
    S = scene.geometry.sph_c.shape[0]
    lane = jnp.arange(N, dtype=jnp.uint32)
    u1, u2 = rng.uniform2(0, lane, 1)
    o = jnp.broadcast_to(scene.camera.position, (N, 3)) + 0.0
    z = u1 * 2.0 - 1.0
    phi = u2 * 6.2831853
    zs = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    d = jnp.stack([zs * jnp.cos(phi), zs * jnp.sin(phi), z], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def brute_body(carry):
        oo, acc = carry
        h = intersect_brute(oo, d, scene.geometry)
        return (oo + 1e-6, acc + h.t)

    dt = timeit_scan(brute_body, (o, jnp.zeros(N)))
    ops = T * (OPS_TRI_MT + OPS_TRI_FOLD) + S * OPS_SPH
    add(f"intersect_brute (T={T},S={S})", dt, ops, 28, "flagship nearest-hit")

    def rng_body(carry):
        acc, i = carry
        s = acc
        for kk in range(2):
            a, b, cc, dd = rng.uniform4(7, lane, kk)
            s = s + a + b + cc + dd
        return (s, i + 1)

    dt = timeit_scan(rng_body, (jnp.zeros(N), jnp.int32(0)))
    # Label/op-count follow the active mixer: uniform4 under threefry costs
    # two threefry2x32 blocks per call (LLR_RNG dispatch in ops/rng.py).
    if rng._MIXER == "pcg4d":
        rng_label, rng_ops = "rng (2x pcg4d)", 2 * OPS_RNG4
    else:
        rng_label, rng_ops = "rng (4x threefry2x32)", 4 * OPS_RNG2
    add(rng_label, dt, rng_ops, 4, "per-bounce budget")

    step = make_bounce_step(scene, c.settings, 0, allow_fused=False)
    st = PathState(
        bounce=jnp.int32(0), o=o, d=d, throughput=jnp.ones((N, 3)),
        accum=jnp.zeros((N, 3)), alive=jnp.ones((N,), bool),
        rays_traced=jnp.float32(0), lane=lane,
    )

    def full_body(s):
        s = step(s)
        return s._replace(bounce=jnp.int32(0), alive=jnp.ones((N,), bool))

    dt = timeit_scan(full_body, st)
    # Bounce = 2 nearest-hit queries (path + shadow) + BSDF + NEE + RNG.
    ops = 2 * (T * (OPS_TRI_MT + OPS_TRI_FOLD) + S * OPS_SPH) + OPS_BSDF + OPS_NEE_LOCAL + 5 * OPS_RNG2
    add("full bounce step (XLA)", dt, ops, 3 * 28, "2 rays/lane/bounce")

    # Fused Pallas bounce step (round 4): the whole transition in one
    # kernel — the answer to the XLA row's layout/bookkeeping verdict.
    from lumillyrender_tpu.ops import pallas_bounce

    if pallas_bounce.enabled(scene, c.settings):
        step_f = pallas_bounce.make_step(scene, c.settings, 0)

        def fused_body(s):
            s = step_f(s)
            return s._replace(bounce=jnp.int32(0),
                              alive=jnp.ones((N,), bool))

        dt = timeit_scan(fused_body, st)
        add("full bounce step (fused)", dt, ops, 3 * 28,
            "one Pallas program")

    # ---- backward decomposition (VERDICT r2 weak #4) ---------------------
    # (a) VJP of ONE bounce step: loss-form forward vs value_and_grad over
    # the same function isolates the pure backward cost of the shading +
    # traversal-VJP chain at full wavefront width.
    thr0 = jnp.ones((N, 3))

    def one_bounce_loss(o_, d_, thr):
        st = PathState(
            bounce=jnp.int32(1), o=o_, d=d_, throughput=thr,
            accum=jnp.zeros((N, 3)), alive=jnp.ones((N,), bool),
            rays_traced=jnp.float32(0), lane=lane,
        )
        s2 = step(st)
        return jnp.sum(s2.accum) + jnp.sum(s2.throughput * s2.d)

    def fwd_loss_body(carry):
        o_, acc = carry
        v = one_bounce_loss(o_, d, thr0)
        return (o_ + 1e-9 * v, acc + v)

    dt_f = timeit_scan(fwd_loss_body, (o, jnp.float32(0.0)))

    gfn = jax.grad(one_bounce_loss, argnums=(0, 1, 2))

    def vjp_body(carry):
        o_, acc = carry
        go, gd, gt = gfn(o_, d, thr0)
        return (o_ + 1e-9 * go, acc + jnp.sum(gt[:, 0]))

    dt_g = timeit_scan(vjp_body, (o, jnp.float32(0.0)))
    # Backward replays shading (~1x) + traversal plane-eq VJP; report the
    # measured bwd-only time with its analytic op estimate.
    dt_bwd = max(dt_g - dt_f, 1e-9)
    bwd_ops = 2 * (OPS_BSDF + OPS_NEE_LOCAL) + 80
    add("bounce step VJP (bwd only)", dt_bwd, bwd_ops, 3 * 28,
        f"grad-fwd {dt_g*1e3:.2f} ms vs fwd {dt_f*1e3:.2f} ms")

    # (b) film scatter-add cotangent: forward scatter vs its VJP (gather).
    n_pix = 256 * 256
    pix = (lane % jnp.uint32(n_pix)).astype(jnp.int32)
    vals = jnp.ones((N, 3))

    def bank_loss(v):
        film = jnp.zeros((n_pix, 3)).at[pix].add(v)
        return jnp.sum(film * film)

    def bank_fwd_body(carry):
        v, acc = carry
        s = bank_loss(v)
        return (v + 1e-12 * s, acc + s)

    dt_bf = timeit_scan(bank_fwd_body, (vals, jnp.float32(0.0)))
    bgrad = jax.grad(bank_loss)

    def bank_vjp_body(carry):
        v, acc = carry
        g = bgrad(v)
        return (v + 1e-12 * g, acc + jnp.sum(g[:, 0]))

    dt_bg = timeit_scan(bank_vjp_body, (vals, jnp.float32(0.0)))
    add("film bank VJP (bwd only)", max(dt_bg - dt_bf, 1e-9), 6, 24,
        f"scatter {dt_bf*1e3:.2f} ms, +vjp {dt_bg*1e3:.2f} ms")

    # (c) material-table one-hot select VJP (the differentiable gather).
    mtab = jnp.asarray(np.random.default_rng(0).random((8, 3)), jnp.float32)
    midx = (lane % jnp.uint32(8)).astype(jnp.int32)
    from lumillyrender_tpu.ops.table import take_rows

    def rows_loss(tab):
        r = take_rows(tab, midx)
        return jnp.sum(r * vals)

    rgrad = jax.grad(rows_loss)

    def rows_fwd_body(carry):
        tab, acc = carry
        s = rows_loss(tab)
        return (tab + 1e-12 * s, acc + s)

    def rows_vjp_body(carry):
        tab, acc = carry
        g = rgrad(tab)
        return (tab + 1e-12 * g, acc + jnp.sum(g))

    dt_rf = timeit_scan(rows_fwd_body, (mtab, jnp.float32(0.0)))
    dt_rg = timeit_scan(rows_vjp_body, (mtab, jnp.float32(0.0)))
    add("take_rows VJP (bwd only)", max(dt_rg - dt_rf, 1e-9), 8 * 4, 12,
        f"one-hot fwd {dt_rf*1e3:.2f} ms, +vjp {dt_rg*1e3:.2f} ms")

    # ---- flagship fwd+bwd: one differentiable bounce chain ---------------
    import dataclasses

    from lumillyrender_tpu.diff.render import film_and_grads, params_of

    W = H = 128
    SPP = 4
    MB = 8
    cset = dataclasses.replace(c.settings, width=W, height=H, max_bounces=MB)
    params = params_of(scene)
    target = jnp.zeros((H, W, 3), jnp.float32)
    loss, film, grads = film_and_grads(scene, cset, params, target, 0, SPP)
    _force(loss)
    t0 = time.monotonic()
    REPS_BWD = 5
    for i in range(REPS_BWD):
        loss, film, grads = film_and_grads(scene, cset, params, target, 1 + i, SPP)
        _force(loss)
    dt_b = (time.monotonic() - t0) / REPS_BWD
    lanes_b = W * H * SPP
    # Reverse pass re-plays the shading chain (~2x fwd shading ops) but the
    # traversal VJP is one plane-equation reconstruction per bounce (~40
    # ops); counted analytically per lane over MB fixed bounces.
    fwd_ops = MB * (
        2 * (T * (OPS_TRI_MT + OPS_TRI_FOLD) + S * OPS_SPH)
        + OPS_BSDF + OPS_NEE_LOCAL + 5 * OPS_RNG2
    )
    bwd_ops = MB * (2 * (OPS_BSDF + OPS_NEE_LOCAL) + 40)
    ach = (fwd_ops + bwd_ops) * lanes_b / dt_b
    rows.append(
        dict(
            stage=f"train step fwd+bwd ({W}x{H}x{SPP}spp, {MB} bounces)",
            ms=dt_b * 1e3,
            lanes_per_s=lanes_b / dt_b,
            achieved_gflops=ach / 1e9,
            pct_vpu=100 * ach / VPU,
            hbm_gbs=0.0,
            pct_hbm=0.0,
            note="analytic fwd+bwd ops over fixed-depth scan",
        )
    )
    print(
        f"{'train step fwd+bwd':26s} {dt_b*1e3:8.2f} ms "
        f"{lanes_b/dt_b/1e6:7.1f} Mlanes/s {ach/1e12:6.3f} TFLOP/s "
        f"= {100*ach/VPU:5.1f}% VPU",
        flush=True,
    )

    # ---- mesh scene (82k tris): Pallas packet kernel --------------------
    cb = compile_scene_file(REPO / "assets" / "sample.toml", spp=1)
    gb, bb = cb.data.geometry, cb.data.bvh
    lo = np.asarray(jnp.min(bb.node_min, axis=0))
    hi = np.asarray(jnp.max(bb.node_max, axis=0))
    ctr, ext = (lo + hi) / 2, float(np.max(hi - lo))
    rs = np.random.default_rng(0)
    oi = ctr + (rs.random((N, 3)) - 0.5) * 1.2 * ext
    di = rs.normal(size=(N, 3))
    di /= np.linalg.norm(di, axis=1, keepdims=True)
    oi = jnp.asarray(oi, jnp.float32)
    di = jnp.asarray(di, jnp.float32)

    def pallas_body(carry):
        oo, acc = carry
        h = intersect_bvh(oo, di, gb, bb, use_pallas=True)
        return (oo + 1e-6, acc + h.t)

    dt = timeit_scan(pallas_body, (oi, jnp.zeros(N)), repeat=5)
    nodes_pp, leaves_pp, k = simulate_packet_walk(
        bb, oi, di, np.full(N, 1e5, np.float32), packets=8
    )
    ops = (nodes_pp * OPS_SLAB + leaves_pp * k * (OPS_TRI_MT + OPS_TRI_FOLD)) / 1024.0
    add(
        f"pallas packet walk (82k tris)", dt, ops, 28,
        f"{nodes_pp:.0f} nodes + {leaves_pp:.0f} leaves/packet (K={k})",
    )

    out = dict(
        ceilings=ceil,
        analytic_op_costs=dict(
            tri_mt=OPS_TRI_MT, tri_fold=OPS_TRI_FOLD, sphere=OPS_SPH,
            slab=OPS_SLAB, bsdf=OPS_BSDF, nee_local=OPS_NEE_LOCAL,
            rng_uniform2=OPS_RNG2,
        ),
        lanes=N,
        stages=rows,
    )
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=2))

    print("\n| Stage | ms | Mlanes/s | useful TFLOP/s | % VPU SoL | HBM GB/s | bound by |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        bound = "VPU issue" if r["pct_vpu"] > r["pct_hbm"] else "HBM"
        print(
            f"| {r['stage']} | {r['ms']:.2f} | {r['lanes_per_s']/1e6:.1f} | "
            f"{r['achieved_gflops']/1e3:.3f} | {r['pct_vpu']:.1f}% | "
            f"{r['hbm_gbs']:.1f} | {bound} ({r['note']}) |"
        )


if __name__ == "__main__":
    main()
