"""Ray-scene intersection kernels over SoA geometry.

Parity: Möller-Trumbore triangles (`triangle.rs:69-100`), quadratic spheres
(`sphere.rs:42-63`), both with the reference's exact EPS semantics
(t < EPS -> miss, |det| < EPS -> miss).

Two interchangeable intersectors (identical results, different perf):

* `intersect_brute` — streaming all-prims test, chunked over the prim table
  with a `lax.scan` running min. Dense, branchless, VPU-saturating; the
  right choice for small/medium scenes on TPU and the correctness oracle
  for everything else.
* `intersect_bvh` — stackless threaded-BVH cursor traversal (see
  `accel/sah.py` for the layout). Ordered, t-max-pruned; unlike the
  reference's collect-then-test traversal (`bvh.rs:131-141`) no per-ray
  allocation exists. Same nearest hit by construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import EPS, INF
from ..scene.data import Bvh, Geometry
from . import vec


class Hit(NamedTuple):
    t: jax.Array  # (N,) distance; >= INF means miss
    prim: jax.Array  # (N,) int32 prim id; -1 on miss


class ShadePoint(NamedTuple):
    position: jax.Array  # (N, 3)
    normal: jax.Array  # (N, 3) geometric outward normal
    mat: jax.Array  # (N,) int32 material row; -1 on miss
    hit: jax.Array  # (N,) bool


def _tri_t(o, d, p0, e1, e2):
    """Batched MT test -> t matrix with misses as +INF.

    o,d: (N,1,3); p0,e1,e2: (1,C,3) or per-lane (N,C,3). Returns (N,C).
    """
    pv = jnp.cross(d, e2)
    det = jnp.sum(e1 * pv, axis=-1)
    # Guard BEFORE the reciprocal so reverse-mode stays NaN-free on the
    # masked (near-parallel) lanes ("double-where" pattern).
    det_ok = jnp.abs(det) >= EPS
    inv = 1.0 / jnp.where(det_ok, det, 1.0)
    tv = o - p0
    u = jnp.sum(tv * pv, axis=-1) * inv
    qv = jnp.cross(tv, e1)
    v = jnp.sum(d * qv, axis=-1) * inv
    t = jnp.sum(e2 * qv, axis=-1) * inv
    ok = (
        det_ok
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t >= EPS)
    )
    return jnp.where(ok, t, INF)


def _tri_t_T(o, d, p0, e1, e2):
    """Transposed MT test: rays live on the 128-lane axis.

    o,d: 3-tuples of (N,) ray components; p0,e1,e2: (C,3) prim chunks.
    Returns t (C,N) with misses as +INF. Identical math to `_tri_t`; only
    the layout differs — every intermediate is a dense (C,N) array (N on
    vector lanes) instead of (N,C,3) whose size-3 minor dim wastes 125/128
    TPU lanes (measured 8-40x slower).
    """
    ox, oy, oz = (c[None, :] for c in o)  # (1,N)
    dx, dy, dz = (c[None, :] for c in d)
    p0x, p0y, p0z = (p0[:, i : i + 1] for i in range(3))  # (C,1)
    e1x, e1y, e1z = (e1[:, i : i + 1] for i in range(3))
    e2x, e2y, e2z = (e2[:, i : i + 1] for i in range(3))

    # pv = d x e2  (C,N)
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    det_ok = jnp.abs(det) >= EPS
    inv = 1.0 / jnp.where(det_ok, det, 1.0)
    # tv = o - p0
    tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
    # qv = tv x e1
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
    ok = (
        det_ok
        & (u >= 0.0) & (u <= 1.0)
        & (v >= 0.0) & (u + v <= 1.0)
        & (t >= EPS)
    )
    return jnp.where(ok, t, INF)


def _sph_t(o, d, c, r):
    """Batched sphere test -> t matrix. o,d: (N,1,3); c: (1,C,3); r: (1,C)."""
    co = o - c
    cod = jnp.sum(co * d, axis=-1)
    det = cod * cod - jnp.sum(co * co, axis=-1) + r * r
    # sqrt input guarded before the nonlinearity (reverse-mode NaN safety).
    sq = jnp.sqrt(jnp.where(det > 0.0, det, 1.0))
    t1 = -cod - sq
    t2 = -cod + sq
    t = jnp.where(t1 > EPS, t1, t2)
    ok = (det > 0.0) & (t > EPS)
    # Note the reference's asymmetric comparisons: triangles use t < EPS ->
    # miss (`triangle.rs:90`), spheres use t1 < EPS && t2 < EPS -> miss with
    # `t1 > EPS` selecting (`sphere.rs:51-54`).
    return jnp.where(ok, t, INF)


def _sph_t_T(o, d, c, r):
    """Transposed sphere test (see `_tri_t_T`). o,d: 3-tuples of (N,);
    c: (C,3); r: (C,). Returns (C,N)."""
    ox, oy, oz = (k[None, :] for k in o)
    dx, dy, dz = (k[None, :] for k in d)
    cx, cy, cz = (c[:, i : i + 1] for i in range(3))
    r1 = r[:, None]
    cox, coy, coz = ox - cx, oy - cy, oz - cz
    cod = cox * dx + coy * dy + coz * dz
    det = cod * cod - (cox * cox + coy * coy + coz * coz) + r1 * r1
    sq = jnp.sqrt(jnp.where(det > 0.0, det, 1.0))
    t1 = -cod - sq
    t2 = -cod + sq
    t = jnp.where(t1 > EPS, t1, t2)
    ok = (det > 0.0) & (t > EPS)
    return jnp.where(ok, t, INF)


def intersect_brute(o, d, geom: Geometry, chunk: int = 8) -> Hit:
    """Nearest hit by streaming over the prim table. o,d: (N,3).

    Transposed layout: prim chunks of `chunk` ride the sublane axis, the N
    rays ride the 128-wide lane axis, so every MT/sphere test is dense
    (`_tri_t_T`). The chunk loop is a `lax.scan` with mild unrolling —
    sequential over prims, saturating over rays.
    """
    n = o.shape[0]
    nt = geom.tri_p0.shape[0]
    ns = geom.sph_c.shape[0]
    oT = tuple(o[:, i] for i in range(3))
    dT = tuple(d[:, i] for i in range(3))

    best_t = jnp.full((n,), INF, o.dtype)
    best_p = jnp.full((n,), -1, jnp.int32)

    def pad(x, c, fill):
        m = x.shape[0]
        p = (-m) % c
        if p:
            x = jnp.concatenate([x, jnp.full((p,) + x.shape[1:], fill, x.dtype)], 0)
        return x

    def fold(best, t, start, base, offset):
        bt, bp = best
        j = jnp.argmin(t, axis=0)  # (N,)
        tmin = jnp.min(t, axis=0)
        pid = offset + start + base[j]
        upd = tmin < bt
        return jnp.where(upd, tmin, bt), jnp.where(upd, pid, bp)

    if nt:
        c = min(chunk, max(8, nt))
        p0 = pad(geom.tri_p0, c, 0.0).reshape(-1, c, 3)
        e1 = pad(geom.tri_e1, c, 0.0).reshape(-1, c, 3)
        e2 = pad(geom.tri_e2, c, 0.0).reshape(-1, c, 3)
        base = jnp.arange(c, dtype=jnp.int32)

        def tri_step(carry, inp):
            cp0, ce1, ce2, start = inp
            t = _tri_t_T(oT, dT, cp0, ce1, ce2)  # (C, N)
            return fold(carry, t, start, base, 0), None

        starts = jnp.arange(p0.shape[0], dtype=jnp.int32) * c
        (best_t, best_p), _ = jax.lax.scan(
            tri_step, (best_t, best_p), (p0, e1, e2, starts), unroll=4
        )

    if ns:
        c = min(chunk, max(8, ns))
        sc = pad(geom.sph_c, c, 0.0).reshape(-1, c, 3)
        # r=0 padding never hits: det = cod^2 - |co|^2 <= 0 (Cauchy-Schwarz).
        sr = pad(geom.sph_r, c, 0.0).reshape(-1, c)
        base = jnp.arange(c, dtype=jnp.int32)

        def sph_step(carry, inp):
            cc, cr, start = inp
            t = _sph_t_T(oT, dT, cc, cr)
            return fold(carry, t, start, base, nt), None

        starts = jnp.arange(sc.shape[0], dtype=jnp.int32) * c
        (best_t, best_p), _ = jax.lax.scan(
            sph_step, (best_t, best_p), (sc, sr, starts), unroll=4
        )

    best_p = jnp.where(best_t < INF, best_p, -1)
    return Hit(t=best_t, prim=best_p)


def _sphere_brute(o, d, geom: Geometry, best_t, best_p, chunk: int = 8):
    """Fold all spheres into the running (best_t, best_p). Spheres stay
    brute-force even in BVH mode: scenes carry a handful of analytic
    spheres, never enough to warrant tree nodes."""
    ns = geom.sph_c.shape[0]
    if not ns:
        return best_t, best_p
    nt = geom.tri_p0.shape[0]
    c = min(chunk, max(8, ns))
    pad_n = (-ns) % c
    sc = jnp.concatenate([geom.sph_c, jnp.zeros((pad_n, 3), geom.sph_c.dtype)], 0)
    sr = jnp.concatenate([geom.sph_r, jnp.zeros((pad_n,), geom.sph_r.dtype)], 0)
    oT = tuple(o[:, i] for i in range(3))
    dT = tuple(d[:, i] for i in range(3))
    t = _sph_t_T(oT, dT, sc, sr)  # (ns+pad, N)
    j = jnp.argmin(t, axis=0)
    tmin = jnp.min(t, axis=0)
    upd = tmin < best_t
    return (
        jnp.where(upd, tmin, best_t),
        jnp.where(upd, nt + j.astype(jnp.int32), best_p),
    )


_CAND_B = 4  # candidate treelet slots per lane between flushes
_WALK_S = 16  # node-walk steps per outer iteration


def intersect_bvh(o, d, geom: Geometry, bvh: Bvh) -> Hit:
    """Collect-then-flush cursor traversal of the treelet BVH. o,d: (N,3).

    TPU gathers run far below streaming bandwidth, so the inner walk touches
    ONLY a packed 8-float node row per lane per step, buffering up to B hit
    treelet ids; every S steps the buffer is flushed — B contiguous block
    gathers + B*K dense MT tests — and best_t tightens (pruning later
    subtrees). Lanes with a full buffer stall until the next flush; no
    candidate is ever dropped, so the nearest hit matches brute force
    exactly. (Echoes the reference's collect-then-test `bvh.rs:131-141`,
    minus its per-ray Vec allocation and unordered full test.)
    """
    n = o.shape[0]
    inv_d = 1.0 / d  # IEEE inf on zero components, like the reference slab test

    best_t0 = jnp.full((n,), INF, o.dtype)
    best_p0 = jnp.full((n,), -1, jnp.int32)
    best_t0, best_p0 = _sphere_brute(o, d, geom, best_t0, best_p0)

    if geom.tri_p0.shape[0] == 0:
        return Hit(t=best_t0, prim=jnp.where(best_t0 < INF, best_p0, -1))

    # Packed node row: min(3) max(3) miss leaf — one gather per step. Links
    # are exact as f32 (node/block counts stay far below 2^24).
    nodes8 = jnp.concatenate(
        [
            bvh.node_min,
            bvh.node_max,
            bvh.node_miss.astype(o.dtype)[:, None],
            bvh.node_leaf.astype(o.dtype)[:, None],
        ],
        axis=1,
    )
    k = bvh.blk_p0.shape[1]
    # Component-major block tables, (L, 9, K): one gather per candidate
    # fetches a (n, 9, K) slab whose MT math then runs on dense (n, K)
    # arrays (K on lanes) — never on size-3 minor dims.
    blk9 = jnp.stack(
        [bvh.blk_p0[:, :, i] for i in range(3)]
        + [bvh.blk_e1[:, :, i] for i in range(3)]
        + [bvh.blk_e2[:, :, i] for i in range(3)],
        axis=1,
    )

    def make_body(width):
        def body(state):
            node, best_t, best_p, cand, ncand, o_s, d_s, inv_s, slots = state
            oc = tuple(o_s[:, i] for i in range(3))
            dc = tuple(d_s[:, i] for i in range(3))
            ic = tuple(inv_s[:, i] for i in range(3))

            def walk(carry, _):
                node, best_t, cand, ncand = carry
                active = (node >= 0) & (ncand < _CAND_B)
                row = jnp.take(nodes8, jnp.maximum(node, 0), axis=0)
                miss = row[:, 6].astype(jnp.int32)
                leaf = row[:, 7].astype(jnp.int32)
                # Slab test, componentwise over (n,) lanes.
                tmin = jnp.full(node.shape, -jnp.inf, o_s.dtype)
                tmax = jnp.full(node.shape, jnp.inf, o_s.dtype)
                for a in range(3):
                    ta = (row[:, a] - oc[a]) * ic[a]
                    tb = (row[:, 3 + a] - oc[a]) * ic[a]
                    tmin = jnp.maximum(tmin, jnp.minimum(ta, tb))
                    tmax = jnp.minimum(tmax, jnp.maximum(ta, tb))
                box_hit = (tmin <= tmax) & (tmax >= EPS) & (tmin < best_t)
                is_leaf = leaf >= 0
                push = active & box_hit & is_leaf
                si = jax.lax.broadcasted_iota(jnp.int32, (width, _CAND_B), 1)
                cand = jnp.where(
                    push[:, None] & (si == ncand[:, None]), leaf[:, None], cand
                )
                ncand = ncand + push.astype(jnp.int32)
                descend = box_hit & ~is_leaf
                node = jnp.where(active, jnp.where(descend, node + 1, miss), node)
                return (node, best_t, cand, ncand), None

            (node, best_t, cand, ncand), _ = jax.lax.scan(
                walk, (node, best_t, cand, ncand), None, length=_WALK_S
            )
            ocl = tuple(c[:, None] for c in oc)  # (n,1)
            dcl = tuple(c[:, None] for c in dc)
            for b in range(_CAND_B):
                cb = cand[:, b]
                have = cb >= 0
                blk = jnp.maximum(cb, 0)
                g = jnp.take(blk9, blk, axis=0)  # (n, 9, K)
                prim = jnp.take(bvh.blk_prim, blk, axis=0)  # (n, K)
                # Möller-Trumbore on (n, K) components (same math as
                # `_tri_t_T`, per-lane prim slabs instead of shared chunks).
                p0x, p0y, p0z = g[:, 0], g[:, 1], g[:, 2]
                e1x, e1y, e1z = g[:, 3], g[:, 4], g[:, 5]
                e2x, e2y, e2z = g[:, 6], g[:, 7], g[:, 8]
                dx, dy, dz = dcl
                ox, oy, oz = ocl
                pvx = dy * e2z - dz * e2y
                pvy = dz * e2x - dx * e2z
                pvz = dx * e2y - dy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                det_ok = jnp.abs(det) >= EPS
                inv = 1.0 / jnp.where(det_ok, det, 1.0)
                tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
                u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                v = (dx * qvx + dy * qvy + dz * qvz) * inv
                t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
                ok = (
                    det_ok
                    & (u >= 0.0) & (u <= 1.0)
                    & (v >= 0.0) & (u + v <= 1.0)
                    & (t >= EPS) & (prim >= 0)
                )
                t = jnp.where(ok, t, INF)
                j = jnp.argmin(t, axis=1)
                tmin_blk = jnp.min(t, axis=1)
                pid = jnp.take_along_axis(prim, j[:, None], axis=1)[:, 0]
                upd = have & (tmin_blk < best_t)
                best_t = jnp.where(upd, tmin_blk, best_t)
                best_p = jnp.where(upd, pid, best_p)
            cand = jnp.full((width, _CAND_B), -1, jnp.int32)
            ncand = jnp.zeros((width,), jnp.int32)
            return node, best_t, best_p, cand, ncand, o_s, d_s, inv_s, slots

        return body

    # Straggler compaction: stage widths shrink as lanes finish traversal
    # (p50 of node visits is tiny, the tail is long — SIMD pays for the
    # worst lane, so shrink the wavefront instead of waiting). Each stage
    # runs until the active count fits the next width, then compacts; final
    # results scatter back by slot id. Exact — no lane is ever dropped.
    widths = []
    w = n
    while True:
        widths.append(w)
        if w <= 4096:
            break
        w = max(4096, w // 8)

    res_t = best_t0
    res_p = best_p0
    state = (
        jnp.zeros((n,), jnp.int32),
        best_t0,
        best_p0,
        jnp.full((n, _CAND_B), -1, jnp.int32),
        jnp.zeros((n,), jnp.int32),
        o,
        d,
        inv_d,
        jnp.arange(n, dtype=jnp.int32),
    )
    for i, w in enumerate(widths):
        nxt = widths[i + 1] if i + 1 < len(widths) else 0

        def cond(s, nxt=nxt):
            node, _, _, _, ncand = s[0], s[1], s[2], s[3], s[4]
            active = (node >= 0) | (ncand > 0)
            return jnp.any(active) & (jnp.sum(active.astype(jnp.int32)) > nxt)

        state = jax.lax.while_loop(cond, make_body(w), state)
        node, best_t, best_p, cand, ncand, o_s, d_s, inv_s, slots = state
        res_t = res_t.at[slots].set(best_t)
        res_p = res_p.at[slots].set(best_p)
        if nxt:
            active = (node >= 0) | (ncand > 0)
            order = jnp.argsort(~active)[:nxt]  # actives first (stable)
            state = (
                jnp.take(node, order),
                jnp.take(best_t, order),
                jnp.take(best_p, order),
                jnp.take(cand, order, axis=0),
                jnp.take(ncand, order),
                jnp.take(o_s, order, axis=0),
                jnp.take(d_s, order, axis=0),
                jnp.take(inv_s, order, axis=0),
                jnp.take(slots, order),
            )
    node, best_t, best_p, _, _, _, _, _, slots = state
    res_t = res_t.at[slots].set(best_t)
    res_p = res_p.at[slots].set(best_p)
    return Hit(t=res_t, prim=jnp.where(res_t < INF, res_p, -1))


def intersect(o, d, geom: Geometry, bvh: Bvh, mode: str = "auto") -> Hit:
    nprim = geom.tri_p0.shape[0] + geom.sph_c.shape[0]
    if mode == "brute" or (mode == "auto" and nprim <= 512):
        return intersect_brute(o, d, geom)
    return intersect_bvh(o, d, geom, bvh)


def shade_point(o, d, hit: Hit, geom: Geometry) -> ShadePoint:
    """Gather surface data at hit points (the reference's `Intersection`)."""
    nt = geom.tri_p0.shape[0]
    ns = geom.sph_c.shape[0]
    hitmask = hit.prim >= 0
    prim = jnp.maximum(hit.prim, 0)
    is_tri = prim < nt
    pos = o + d * hit.t[..., None]

    normal = jnp.zeros_like(pos)
    mat = jnp.full(prim.shape, -1, jnp.int32)
    if nt:
        tid = jnp.clip(prim, 0, nt - 1)
        normal = jnp.where(
            is_tri[..., None], jnp.take(geom.tri_n, tid, axis=0), normal
        )
        mat = jnp.where(is_tri, jnp.take(geom.tri_mat, tid, axis=0), mat)
    if ns:
        sid = jnp.clip(prim - nt, 0, ns - 1)
        c = jnp.take(geom.sph_c, sid, axis=0)
        sn = vec.safe_normalize(pos - c)
        normal = jnp.where(is_tri[..., None], normal, sn)
        mat = jnp.where(is_tri, mat, jnp.take(geom.sph_mat, sid, axis=0))

    mat = jnp.where(hitmask, mat, -1)
    # Miss lanes get a unit dummy normal: downstream basis construction and
    # its backward pass must stay NaN-free even on dead lanes.
    normal = jnp.where(
        hitmask[..., None], normal, jnp.array([0.0, 0.0, 1.0], normal.dtype)
    )
    return ShadePoint(position=pos, normal=normal, mat=mat, hit=hitmask)
