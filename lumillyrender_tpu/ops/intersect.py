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

    o,d: (N,1,3); p0,e1,e2: (1,C,3). Returns (N,C).
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


def intersect_brute(o, d, geom: Geometry, chunk: int = 256) -> Hit:
    """Nearest hit by streaming over the prim table. o,d: (N,3)."""
    n = o.shape[0]
    nt = geom.tri_p0.shape[0]
    ns = geom.sph_c.shape[0]
    o1 = o[:, None, :]
    d1 = d[:, None, :]

    best_t = jnp.full((n,), INF, o.dtype)
    best_p = jnp.full((n,), -1, jnp.int32)

    def pad(x, c, fill):
        m = x.shape[0]
        p = (-m) % c
        if p:
            x = jnp.concatenate([x, jnp.full((p,) + x.shape[1:], fill, x.dtype)], 0)
        return x

    if nt:
        c = min(chunk, max(8, nt))
        p0 = pad(geom.tri_p0, c, 0.0).reshape(-1, c, 3)
        e1 = pad(geom.tri_e1, c, 0.0).reshape(-1, c, 3)
        e2 = pad(geom.tri_e2, c, 0.0).reshape(-1, c, 3)
        base = jnp.arange(c, dtype=jnp.int32)

        def tri_step(carry, inp):
            bt, bp = carry
            cp0, ce1, ce2, start = inp
            t = _tri_t(o1, d1, cp0[None], ce1[None], ce2[None])  # (N, C)
            j = jnp.argmin(t, axis=1)
            tmin = jnp.take_along_axis(t, j[:, None], axis=1)[:, 0]
            pid = start + base[j]
            upd = tmin < bt
            return (jnp.where(upd, tmin, bt), jnp.where(upd, pid, bp)), None

        starts = jnp.arange(p0.shape[0], dtype=jnp.int32) * c
        (best_t, best_p), _ = jax.lax.scan(
            tri_step, (best_t, best_p), (p0, e1, e2, starts)
        )

    if ns:
        c = min(chunk, max(8, ns))
        sc = pad(geom.sph_c, c, 0.0).reshape(-1, c, 3)
        # r=0 padding never hits: det = cod^2 - |co|^2 <= 0 (Cauchy-Schwarz).
        sr = pad(geom.sph_r, c, 0.0).reshape(-1, c)
        base = jnp.arange(c, dtype=jnp.int32)

        def sph_step(carry, inp):
            bt, bp = carry
            cc, cr, start = inp
            t = _sph_t(o1, d1, cc[None], cr[None])
            j = jnp.argmin(t, axis=1)
            tmin = jnp.take_along_axis(t, j[:, None], axis=1)[:, 0]
            pid = nt + start + base[j]
            upd = tmin < bt
            return (jnp.where(upd, tmin, bt), jnp.where(upd, pid, bp)), None

        starts = jnp.arange(sc.shape[0], dtype=jnp.int32) * c
        (best_t, best_p), _ = jax.lax.scan(
            sph_step, (best_t, best_p), (sc, sr, starts)
        )

    best_p = jnp.where(best_t < INF, best_p, -1)
    return Hit(t=best_t, prim=best_p)


def _prim_t(o, d, prim, geom: Geometry):
    """Intersect each lane with one gathered primitive. o,d: (N,3); prim (N,)."""
    nt = geom.tri_p0.shape[0]
    is_tri = prim < nt
    tid = jnp.clip(prim, 0, max(nt - 1, 0))
    sid = jnp.clip(prim - nt, 0, max(geom.sph_c.shape[0] - 1, 0))

    t_out = jnp.full(prim.shape, INF, o.dtype)
    if nt:
        p0 = jnp.take(geom.tri_p0, tid, axis=0)
        e1 = jnp.take(geom.tri_e1, tid, axis=0)
        e2 = jnp.take(geom.tri_e2, tid, axis=0)
        tt = _tri_t(o[:, None], d[:, None], p0[:, None], e1[:, None], e2[:, None])[:, 0]
        t_out = jnp.where(is_tri, tt, t_out)
    if geom.sph_c.shape[0]:
        c = jnp.take(geom.sph_c, sid, axis=0)
        r = jnp.take(geom.sph_r, sid, axis=0)
        ts = _sph_t(o[:, None], d[:, None], c[:, None], r[:, None])[:, 0]
        t_out = jnp.where(is_tri, t_out, ts)
    return t_out


def intersect_bvh(o, d, geom: Geometry, bvh: Bvh) -> Hit:
    """Stackless cursor traversal of the threaded BVH. o,d: (N,3)."""
    n = o.shape[0]
    inv_d = 1.0 / d  # IEEE inf on zero components, like the reference slab test

    def cond(state):
        node, _, _ = state
        return jnp.any(node >= 0)

    def body(state):
        node, best_t, best_p = state
        active = node >= 0
        idx = jnp.maximum(node, 0)
        nmin = jnp.take(bvh.node_min, idx, axis=0)
        nmax = jnp.take(bvh.node_max, idx, axis=0)
        miss = jnp.take(bvh.node_miss, idx, axis=0)
        leaf = jnp.take(bvh.node_leaf, idx, axis=0)

        t1 = (nmin - o) * inv_d
        t2 = (nmax - o) * inv_d
        tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
        # Ordered pruning (reference has none — same nearest hit, fewer
        # visits): the box can't contain a closer valid hit unless its slab
        # interval intersects [EPS, best_t].
        box_hit = (tmin <= tmax) & (tmax >= EPS) & (tmin < best_t)

        is_leaf = leaf >= 0
        do_prim = active & box_hit & is_leaf
        pt = _prim_t(o, d, jnp.maximum(leaf, 0), geom)
        upd = do_prim & (pt < best_t)
        best_t = jnp.where(upd, pt, best_t)
        best_p = jnp.where(upd, leaf, best_p)

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, node + 1, miss)
        node = jnp.where(active, nxt, node)
        return node, best_t, best_p

    node0 = jnp.zeros((n,), jnp.int32)
    best_t0 = jnp.full((n,), INF, o.dtype)
    best_p0 = jnp.full((n,), -1, jnp.int32)
    _, best_t, best_p = jax.lax.while_loop(cond, body, (node0, best_t0, best_p0))
    return Hit(t=best_t, prim=best_p)


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
