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
  allocation exists. Same nearest hit up to float-contraction noise: no
  candidate is ever dropped, but XLA picks different FMA groupings for the
  two layouts, so t can differ by ~1e-6 relative (tie-breaks may then flip).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..constants import EPS, INF
from ..scene.data import Bvh, Geometry
from . import vec
from .table import take_rows


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


def _sphere_brute(o, d, geom: Geometry, best_t, best_p, shade=None, chunk: int = 8):
    """Fold all spheres into the running (best_t, best_p). Spheres stay
    brute-force even in BVH mode: scenes carry a handful of analytic
    spheres, never enough to warrant tree nodes.

    With `shade` = (mat, (f0, f1, f2)) the winner's material row and center
    components are dense-selected into the carry as well (see
    `intersect_shade_brute`)."""
    ns = geom.sph_c.shape[0]
    if not ns:
        return (best_t, best_p) if shade is None else (best_t, best_p, *shade)
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
    out_t = jnp.where(upd, tmin, best_t)
    out_p = jnp.where(upd, nt + j.astype(jnp.int32), best_p)
    if shade is None:
        return out_t, out_p
    best_m, best_f = shade
    rows = t.shape[0]
    oh = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) == j[None, :]
    sel = lambda col: jnp.sum(jnp.where(oh, col[:, None], 0), axis=0)
    sm = jnp.concatenate(
        [geom.sph_mat, jnp.full((pad_n,), -1, jnp.int32)], 0
    )
    out_m = jnp.where(upd, sel(sm), best_m)
    out_f = tuple(
        jnp.where(upd, sel(sc[:, i]), best_f[i]) for i in range(3)
    )
    return out_t, out_p, out_m, out_f


_CAND_B = 4  # candidate treelet slots per lane between flushes
_WALK_S = 16  # node-walk steps per outer iteration


def _spread3(x):
    """Spread the low 10 bits of uint32 x so bit i lands at bit 3i
    (standard Morton part1by2)."""
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def _ray_sort_key(o, d, bvh: Bvh, bits: int = 6):
    """Packet-coherence sort key: [direction octant (3b) | origin Morton
    (3*bits b)] over the root AABB.

    Packet traversal tests every lane against the UNION of the packet's
    subtrees; an incoherent wavefront makes that union most of the tree
    (BIGMESH round 3: 0.11 M rays/s at 1M tris — slower than the XLA walk
    it replaced). Sorting bounce rays so each 1024-lane packet shares an
    origin cell and direction octant shrinks the union to a few treelets.
    Octant-major ordering measured best: rays leaving one cell in one
    octant walk nearly identical node sequences.
    """
    lo = bvh.node_min[0]
    hi = bvh.node_max[0]
    span = jnp.maximum(hi - lo, 1e-20)
    q = jnp.clip(
        ((o - lo) / span) * (1 << bits), 0.0, float((1 << bits) - 1)
    ).astype(jnp.uint32)
    m = (
        _spread3(q[:, 0])
        | (_spread3(q[:, 1]) << 1)
        | (_spread3(q[:, 2]) << 2)
    )
    octant = (
        (d[:, 0] > 0).astype(jnp.uint32) * 4
        + (d[:, 1] > 0).astype(jnp.uint32) * 2
        + (d[:, 2] > 0).astype(jnp.uint32)
    )
    return (octant << (3 * bits)) | m


def intersect_bvh(o, d, geom: Geometry, bvh: Bvh, want_shade: bool = False,
                  use_pallas: bool = False, pallas_interpret: bool = False,
                  t_cap=None, pallas_streamed: bool | None = None,
                  occlusion: bool = False, reorder: bool | None = None):
    """Collect-then-flush cursor traversal of the treelet BVH. o,d: (N,3).

    TPU gathers run far below streaming bandwidth, so the inner walk touches
    ONLY a packed 8-float node row per lane per step, buffering up to B hit
    treelet ids; every S steps the buffer is flushed — B contiguous block
    gathers + B*K dense MT tests — and best_t tightens (pruning later
    subtrees). Lanes with a full buffer stall until the next flush; no
    candidate is ever dropped, so the nearest hit matches brute force up to
    float-contraction (FMA-grouping) noise in t. (Echoes the reference's
    collect-then-test `bvh.rs:131-141`, minus its per-ray Vec allocation and
    unordered full test.)

    With `want_shade` the winner's shade attributes (precomputed face
    normal / sphere center, material row) ride the flush one-hot selects,
    and the return is (Hit, ShadePoint) with no post-hoc prim-table gather
    (per-lane gathers over big tables are the single slowest op in the
    whole renderer; see ops/table.py).
    """
    n = o.shape[0]
    nt = geom.tri_p0.shape[0]
    inv_d = 1.0 / d  # IEEE inf on zero components, like the reference slab test

    # A per-lane `t_cap` (shadow rays: light distance + EPS) initializes the
    # running best so traversal prunes every subtree beyond it — identical
    # results for any hit closer than the cap, miss reported otherwise.
    cap = jnp.full((n,), INF, o.dtype) if t_cap is None else t_cap
    best_t0 = cap
    best_p0 = jnp.full((n,), -1, jnp.int32)
    # Occlusion queries additionally stop a lane once ANY hit lands below
    # cap - 4*EPS: such a hit already settles the |t - dist| <= EPS verdict
    # as "occluded" no matter what closer hits exist, so the true nearest
    # is irrelevant. stop = -INF (never) for nearest-hit queries.
    stop = cap - 4.0 * EPS if occlusion else jnp.full((n,), -INF, o.dtype)
    if want_shade:
        sh0 = (
            jnp.full((n,), -1, jnp.int32),
            (jnp.zeros((n,), o.dtype),) * 3,
        )
        best_t0, best_p0, m0, f0 = _sphere_brute(
            o, d, geom, best_t0, best_p0, shade=sh0
        )
        sh0 = (m0, *f0)
    else:
        best_t0, best_p0 = _sphere_brute(o, d, geom, best_t0, best_p0)
        sh0 = ()

    def finish(res_t, res_p, sh):
        hitmask = res_p >= 0
        hit = Hit(t=res_t, prim=jnp.where(hitmask, res_p, -1))
        if not want_shade:
            return hit
        m, f0_, f1_, f2_ = sh
        pos = o + d * res_t[..., None]
        f = jnp.stack([f0_, f1_, f2_], axis=-1)
        is_tri = hit.prim < nt
        if geom.sph_c.shape[0]:
            sn = vec.safe_normalize(pos - f)
            normal = jnp.where(is_tri[..., None], f, sn)
        else:
            normal = f
        normal = jnp.where(
            hitmask[..., None], normal, jnp.array([0.0, 0.0, 1.0], normal.dtype)
        )
        mat = jnp.where(hitmask, m, -1)
        return hit, ShadePoint(position=pos, normal=normal, mat=mat, hit=hitmask)

    if nt == 0:
        return finish(best_t0, best_p0, sh0)

    # Both triangle backends share one contract: nearest tri strictly
    # closer than the (detached) sphere pre-pass t, prim = -1 otherwise,
    # differentiable via the plane-equation custom_vjp at the detached
    # winner. Where no tri won, the ORIGINAL best_t0 is kept so sphere-lane
    # gradients still flow.
    if use_pallas and bvh.blk_p0.shape[1] == 128:
        # Wide-leaf kernel (ops/pallas_bvh_wide.py): a K=128 BVH is built
        # by the compiler exactly when the mesh is too big for the packet
        # kernel's resident tables (accel/pack.py WIDE_MIN_TRIS); narrow
        # 8-ray packets keep traversal unions tight on such meshes while
        # leaves test as dense (8,128) tiles. Reordering helps its
        # incoherent wavefronts (WIDE_SWEEP.json) and camera rays are
        # tile-ordered already, so sort unless explicitly disabled.
        from . import pallas_bvh_wide

        if pallas_bvh_wide.supported(bvh):
            import os as _os

            _env = _os.environ.get("LLR_REORDER", "auto")
            do_reorder = reorder if _env == "auto" and reorder is not None \
                else _env != "0"
            if do_reorder:
                key = _ray_sort_key(o, d, bvh)
                perm = jnp.argsort(key)
                inv = jnp.zeros_like(perm).at[perm].set(
                    jnp.arange(perm.shape[0], dtype=perm.dtype)
                )
                outs = pallas_bvh_wide.intersect_tris_wide(
                    jnp.take(o, perm, axis=0), jnp.take(d, perm, axis=0),
                    jnp.take(best_t0, perm), bvh, geom.tri_n,
                    want_shade=want_shade, interpret=pallas_interpret,
                    t_stop=jnp.take(stop, perm), tri_mat=geom.tri_mat,
                )
                outs = tuple(jnp.take(x, inv, axis=0) for x in outs)
            else:
                outs = pallas_bvh_wide.intersect_tris_wide(
                    o, d, best_t0, bvh, geom.tri_n, want_shade=want_shade,
                    interpret=pallas_interpret, t_stop=stop,
                    tri_mat=geom.tri_mat,
                )
            t_tri, prim = outs[0], outs[1]
            won = prim >= 0
            res_t = jnp.where(won, t_tri, best_t0)
            res_p = jnp.where(won, prim, best_p0)
            if want_shade:
                m = jnp.where(won, outs[2], sh0[0])
                f = tuple(
                    jnp.where(won, outs[3 + c], sh0[1 + c])
                    for c in range(3)
                )
                return finish(res_t, res_p, (m, *f))
            return finish(res_t, res_p, ())

    if use_pallas:
        # Packet-traversal Pallas kernel (ops/pallas_bvh.py).
        from . import pallas_bvh

        streamed_eff = (
            pallas_streamed if pallas_streamed is not None
            else not pallas_bvh.supported(bvh)
        )
        # Ray reordering (default: streamed kernels, whose big trees make
        # packet-union traversal collapse on incoherent wavefronts): sort
        # lanes by (octant | origin-Morton), traverse, inverse-permute.
        # Exact — each lane still tests a superset of its own subtree
        # leaves, so the per-lane winner is unchanged (same triangles,
        # same arithmetic). Sort cost is two 1-column ops at wavefront
        # width; the traversal saved is orders of magnitude larger
        # (BIGMESH.json: 0.11 -> >=1 M rays/s incoherent at 1M tris).
        import os as _os

        _env = _os.environ.get("LLR_REORDER", "auto")
        if _env in ("0", "1"):
            do_reorder = _env == "1"
        elif reorder is not None:
            do_reorder = reorder
        else:
            # Streamed kernels only: their big trees collapse on
            # incoherent packets (BIGMESH.json), and the traversal saved
            # dwarfs the sort. Resident kernels measured WORSE with
            # sorting at every width tried — full chunks (sample.toml 2M
            # lanes: 30.8 -> 4.7 M rays/s) and compacted bounce stages
            # alike (<=262k-lane cutoff: welcome-geo 22.3 -> 14.6, sample
            # 30.8 -> 23.3): at ~82k tris the packet-union penalty is
            # smaller than the XLA argsort + double permutation.
            do_reorder = streamed_eff
        if do_reorder:
            key = _ray_sort_key(o, d, bvh)
            perm = jnp.argsort(key)
            inv = jnp.zeros_like(perm).at[perm].set(
                jnp.arange(perm.shape[0], dtype=perm.dtype)
            )
            outs = pallas_bvh.intersect_tris_pallas(
                jnp.take(o, perm, axis=0), jnp.take(d, perm, axis=0),
                jnp.take(best_t0, perm), bvh, geom.tri_n,
                want_shade=want_shade, interpret=pallas_interpret,
                streamed=pallas_streamed, t_stop=jnp.take(stop, perm),
            )
            outs = tuple(jnp.take(x, inv, axis=0) for x in outs)
        else:
            outs = pallas_bvh.intersect_tris_pallas(
                o, d, best_t0, bvh, geom.tri_n, want_shade=want_shade,
                interpret=pallas_interpret, streamed=pallas_streamed,
                t_stop=stop,
            )
    else:
        outs = _walk_tris_xla(o, d, best_t0, geom.tri_n, bvh, want_shade,
                              stop)
    t_tri, prim = outs[0], outs[1]
    won = prim >= 0
    res_t = jnp.where(won, t_tri, best_t0)
    res_p = jnp.where(won, prim, best_p0)
    if want_shade:
        m = jnp.where(won, outs[2], sh0[0])
        f = tuple(jnp.where(won, outs[3 + c], sh0[1 + c]) for c in range(3))
        return finish(res_t, res_p, (m, *f))
    return finish(res_t, res_p, ())


def _walk_tris_xla(o, d, t_init, tri_n, bvh: Bvh, want_shade: bool,
                   t_stop=None):
    """XLA-walk triangle intersector with the Pallas kernel's contract:
    (t, prim[, mat, nx, ny, nz]) with prim = -1 where no triangle beat
    `t_init` (t == t_init there). Traversal runs on DETACHED inputs (the
    while_loops are not reverse-differentiable and the winner is a discrete
    decision anyway); given the winner, dt/d(o,d) is the plane-equation
    derivative reconstructed in a custom_vjp — identical maths to
    `pallas_bvh._make_diff_fn`."""
    if t_stop is None:
        t_stop = jnp.full(t_init.shape, -INF, t_init.dtype)

    @jax.custom_vjp
    def f(o, d, t_init, t_stop, tri_n):
        return _walk_raw(
            jax.lax.stop_gradient(o),
            jax.lax.stop_gradient(d),
            jax.lax.stop_gradient(t_init),
            jax.lax.stop_gradient(t_stop),
        )

    def fwd(o, d, t_init, t_stop, tri_n):
        outs = f(o, d, t_init, t_stop, tri_n)
        return outs, (d, outs[0], outs[1], tri_n)

    def bwd(res, g):
        d, t, prim, tri_n = res
        g_t = g[0]
        # t = ((p0 - o) . n) / (d . n)  =>  dt/do = -n/(d.n),
        # dt/dd = -t n/(d.n); zero on miss lanes; prim/mat/normal outputs
        # are piecewise constant (their cotangents are dropped).
        won = prim >= 0
        pid = jnp.maximum(prim, 0)
        nrm = jnp.take(tri_n, pid, axis=0)
        dn = jnp.sum(d * nrm, axis=-1)
        safe = won & (jnp.abs(dn) > 1e-20)
        inv = jnp.where(safe, 1.0 / jnp.where(safe, dn, 1.0), 0.0)
        o_bar = (-g_t * inv)[..., None] * nrm
        d_bar = (-g_t * t * inv)[..., None] * nrm
        return (o_bar, d_bar, jnp.zeros_like(g_t), jnp.zeros_like(g_t),
                jnp.zeros_like(tri_n))

    f.defvjp(fwd, bwd)

    def _walk_raw(o, d, t_init, t_stop):
        return _walk_tris_impl(o, d, t_init, bvh, want_shade, t_stop)

    return f(o, d, t_init, t_stop, tri_n)


def _walk_tris_impl(o, d, t_init, bvh: Bvh, want_shade: bool, t_stop=None):
    """The raw collect-then-flush cursor walk (non-differentiable)."""
    n = o.shape[0]
    inv_d = 1.0 / d
    best_t0 = t_init
    best_p0 = jnp.full((n,), -1, jnp.int32)
    if t_stop is None:
        t_stop = jnp.full((n,), -INF, o.dtype)
    sh0 = (
        (jnp.full((n,), -1, jnp.int32),) + (jnp.zeros((n,), o.dtype),) * 3
        if want_shade
        else ()
    )

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
    # Component-major block tables, (L, 9|12, K): one gather per candidate
    # fetches a (n, C, K) slab whose MT math then runs on dense (n, K)
    # arrays (K on lanes) — never on size-3 minor dims. Shade mode appends
    # the precomputed face-normal components (rows 9-11).
    comps = (
        [bvh.blk_p0[:, :, i] for i in range(3)]
        + [bvh.blk_e1[:, :, i] for i in range(3)]
        + [bvh.blk_e2[:, :, i] for i in range(3)]
    )
    if want_shade:
        comps += [bvh.blk_n[:, :, i] for i in range(3)]
    blk9 = jnp.stack(comps, axis=1)

    def make_body(width):
        def body(state):
            (node, best_t, best_p, cand, ncand, o_s, d_s, inv_s, stop_s,
             slots, sh) = state
            oc = tuple(o_s[:, i] for i in range(3))
            dc = tuple(d_s[:, i] for i in range(3))
            ic = tuple(inv_s[:, i] for i in range(3))

            def walk(carry, _):
                node, best_t, cand, ncand = carry
                # best_t <= stop: occlusion verdict settled, lane done.
                active = (node >= 0) & (ncand < _CAND_B) & (best_t > stop_s)
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
                g = jnp.take(blk9, blk, axis=0)  # (n, 9|12, K)
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
                if want_shade:
                    # Winner's normal + material row via a one-hot over the
                    # K lane axis — the data is already in `g`, no gather.
                    oh = (
                        jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
                        == j[:, None]
                    )
                    selk = lambda comp: jnp.sum(jnp.where(oh, comp, 0), axis=1)
                    bmat = jnp.take(bvh.blk_mat, blk, axis=0)  # (n, K)
                    m, f0_, f1_, f2_ = sh
                    m = jnp.where(upd, selk(bmat), m)
                    f0_ = jnp.where(upd, selk(g[:, 9]), f0_)
                    f1_ = jnp.where(upd, selk(g[:, 10]), f1_)
                    f2_ = jnp.where(upd, selk(g[:, 11]), f2_)
                    sh = (m, f0_, f1_, f2_)
            cand = jnp.full((width, _CAND_B), -1, jnp.int32)
            ncand = jnp.zeros((width,), jnp.int32)
            return (node, best_t, best_p, cand, ncand, o_s, d_s, inv_s,
                    stop_s, slots, sh)

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
    res_sh = sh0
    state = (
        jnp.zeros((n,), jnp.int32),
        best_t0,
        best_p0,
        jnp.full((n, _CAND_B), -1, jnp.int32),
        jnp.zeros((n,), jnp.int32),
        o,
        d,
        inv_d,
        t_stop,
        jnp.arange(n, dtype=jnp.int32),
        sh0,
    )
    for i, w in enumerate(widths):
        nxt = widths[i + 1] if i + 1 < len(widths) else 0

        def cond(s, nxt=nxt):
            node, best_t, ncand, stop_s = s[0], s[1], s[4], s[8]
            active = ((node >= 0) | (ncand > 0)) & (best_t > stop_s)
            return jnp.any(active) & (jnp.sum(active.astype(jnp.int32)) > nxt)

        state = jax.lax.while_loop(cond, make_body(w), state)
        (node, best_t, best_p, cand, ncand, o_s, d_s, inv_s, stop_s,
         slots, sh) = state
        res_t = res_t.at[slots].set(best_t)
        res_p = res_p.at[slots].set(best_p)
        res_sh = tuple(r.at[slots].set(v) for r, v in zip(res_sh, sh))
        if nxt:
            active = ((node >= 0) | (ncand > 0)) & (best_t > stop_s)
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
                jnp.take(stop_s, order),
                jnp.take(slots, order),
                tuple(jnp.take(v, order) for v in sh),
            )
    node, best_t, best_p, _, _, _, _, _, _, slots, sh = state
    res_t = res_t.at[slots].set(best_t)
    res_p = res_p.at[slots].set(best_p)
    res_sh = tuple(r.at[slots].set(v) for r, v in zip(res_sh, sh))
    return (res_t, res_p, *res_sh)


def intersect_shade_brute(o, d, geom: Geometry, chunk: int = 8, t_cap=None):
    """Fused nearest-hit + shade attributes in one chunk scan. o,d: (N,3).

    Same streaming layout as `intersect_brute`, but the fold also carries
    the winner's shade attributes (face normal / sphere center, material
    row), selected densely inside each chunk by a one-hot over the chunk's
    argmin — so no post-hoc per-lane gather over the prim tables is ever
    needed (TPU gathers measured ~3x the cost of the intersection math
    itself; see ops/table.py). Returns (Hit, ShadePoint), bit-identical to
    `intersect_brute` + `shade_point`.
    """
    n = o.shape[0]
    nt = geom.tri_p0.shape[0]
    ns = geom.sph_c.shape[0]
    oT = tuple(o[:, i] for i in range(3))
    dT = tuple(d[:, i] for i in range(3))

    best_t = jnp.full((n,), INF, o.dtype) if t_cap is None else t_cap
    best_p = jnp.full((n,), -1, jnp.int32)
    best_m = jnp.full((n,), -1, jnp.int32)
    # Tri lanes: face normal; sphere lanes: center (normal derived after).
    best_f = (jnp.zeros((n,), o.dtype),) * 3

    def pad(x, c, fill):
        m = x.shape[0]
        p = (-m) % c
        if p:
            x = jnp.concatenate([x, jnp.full((p,) + x.shape[1:], fill, x.dtype)], 0)
        return x

    def fold(carry, t, start, base, offset, attr3, attr_m):
        """attr3: (C,3) winner payload (normal or center); attr_m: (C,) int."""
        bt, bp, bm, bf = carry
        j = jnp.argmin(t, axis=0)  # (N,)
        tmin = jnp.min(t, axis=0)
        c = t.shape[0]
        oh = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0) == j[None, :]
        sel = lambda col: jnp.sum(jnp.where(oh, col[:, None], 0), axis=0)
        pid = offset + start + sel(base)
        mid = sel(attr_m)
        f = tuple(sel(attr3[:, i]) for i in range(3))
        upd = tmin < bt
        return (
            jnp.where(upd, tmin, bt),
            jnp.where(upd, pid, bp),
            jnp.where(upd, mid, bm),
            tuple(jnp.where(upd, f[i], bf[i]) for i in range(3)),
        )

    carry = (best_t, best_p, best_m, best_f)

    if nt:
        c = min(chunk, max(8, nt))
        p0 = pad(geom.tri_p0, c, 0.0).reshape(-1, c, 3)
        e1 = pad(geom.tri_e1, c, 0.0).reshape(-1, c, 3)
        e2 = pad(geom.tri_e2, c, 0.0).reshape(-1, c, 3)
        tn = pad(geom.tri_n, c, 0.0).reshape(-1, c, 3)
        tm = pad(geom.tri_mat, c, -1).reshape(-1, c)
        base = jnp.arange(c, dtype=jnp.int32)

        def tri_step(carry, inp):
            cp0, ce1, ce2, ctn, ctm, start = inp
            t = _tri_t_T(oT, dT, cp0, ce1, ce2)  # (C, N)
            return fold(carry, t, start, base, 0, ctn, ctm), None

        starts = jnp.arange(p0.shape[0], dtype=jnp.int32) * c
        carry, _ = jax.lax.scan(
            tri_step, carry, (p0, e1, e2, tn, tm, starts), unroll=4
        )

    if ns:
        c = min(chunk, max(8, ns))
        sc = pad(geom.sph_c, c, 0.0).reshape(-1, c, 3)
        sr = pad(geom.sph_r, c, 0.0).reshape(-1, c)
        sm = pad(geom.sph_mat, c, -1).reshape(-1, c)
        base = jnp.arange(c, dtype=jnp.int32)

        def sph_step(carry, inp):
            cc, cr, cm, start = inp
            t = _sph_t_T(oT, dT, cc, cr)
            return fold(carry, t, start, base, nt, cc, cm), None

        starts = jnp.arange(sc.shape[0], dtype=jnp.int32) * c
        carry, _ = jax.lax.scan(
            sph_step, carry, (sc, sr, sm, starts), unroll=4
        )

    best_t, best_p, best_m, best_f = carry
    hitmask = best_p >= 0
    hit = Hit(t=best_t, prim=best_p)

    pos = o + d * best_t[..., None]
    f = jnp.stack(best_f, axis=-1)  # (N,3)
    is_tri = best_p < nt
    if ns:
        sn = vec.safe_normalize(pos - f)
        normal = jnp.where(is_tri[..., None], f, sn)
    else:
        normal = f
    normal = jnp.where(
        hitmask[..., None], normal, jnp.array([0.0, 0.0, 1.0], normal.dtype)
    )
    mat = jnp.where(hitmask, best_m, -1)
    return hit, ShadePoint(position=pos, normal=normal, mat=mat, hit=hitmask)


def _use_brute(geom: Geometry, mode: str, bvh: Bvh | None = None) -> bool:
    """Auto brute/BVH threshold.

    Two regimes, both evidence-backed:

    * When the resident packet kernel can serve the scene (`bvh` given,
      on TPU, layout supported), the round-5 end-to-end cliff sweep
      (CLIFF.json, tools/bench_cliff.py) shows the BVH-FUSED bounce
      beats XLA brute from right past the fused-brute kernel's 64-prim
      cap: 15.6 vs 10.3 M rays/s at 68 prims, 14.0 vs 2.4 at 1k, 8.2 vs
      0.73 at 4k, 5.9 vs 0.39 at 8k. Threshold = 64.
    * Otherwise (CPU, interpret, unsupported layouts) the round-3
      sweep_crossover.json worst-case analysis stands: brute wins the
      incoherent-bounce mix through ~8k prims against the XLA walk
      (end-to-end: BRUTE_VS_KERNEL.json, sample.toml kernel 6.16 M vs
      brute 0.23 M at 82k). Threshold = 8192.
    """
    if mode == "brute":
        return True
    if mode != "auto":
        return False
    nprim = geom.tri_p0.shape[0] + geom.sph_c.shape[0]
    threshold = 8192
    if bvh is not None and geom.tri_p0.shape[0] > 0:
        from . import pallas_bvh

        if pallas_bvh.on_tpu() and pallas_bvh.supported(bvh):
            threshold = 64
    return nprim <= threshold


def _resolve(geom: Geometry, bvh: Bvh, mode: str) -> str:
    """Pick the intersector backend: 'brute' | 'bvh' | 'pallas'.

    'auto' = brute below the measured crossover, else the Pallas packet
    kernel when running on TPU — resident tables when they fit VMEM,
    HBM-streaming leaf DMA otherwise (node table must fit) — else the XLA
    walk. Forcing mode='pallas' off-TPU runs the kernel in interpreter
    mode (slow; for tests/debugging).
    """
    if _use_brute(geom, mode, bvh):
        return "brute"
    from . import pallas_bvh

    if mode == "pallas":
        # Fail loudly on layouts the kernel cannot serve (K not dividing
        # 128, or a node table over the streamed VMEM budget): reaching the
        # kernel anyway would die in Mosaic compilation or index treelets
        # incorrectly.
        if not (pallas_bvh.supported(bvh) or pallas_bvh.supported_streamed(bvh)):
            raise ValueError(
                "intersector 'pallas' forced but this BVH layout is "
                f"unsupported (treelet K={bvh.blk_p0.shape[1]} must divide "
                "128 and the packed node table must fit the streamed VMEM "
                f"budget {pallas_bvh.NODE_VMEM_BYTES} B; node table is "
                f"{pallas_bvh.node_vmem_bytes(bvh)} B). Use 'auto'."
            )
        return "pallas"
    if (
        mode == "auto"
        and geom.tri_p0.shape[0] > 0
        and pallas_bvh.on_tpu()
        and (pallas_bvh.supported(bvh) or pallas_bvh.supported_streamed(bvh))
    ):
        return "pallas"
    return "bvh"


def intersect(o, d, geom: Geometry, bvh: Bvh, mode: str = "auto") -> Hit:
    backend = _resolve(geom, bvh, mode)
    if backend == "brute":
        return intersect_brute(o, d, geom)
    if backend == "pallas":
        from . import pallas_bvh

        return intersect_bvh(
            o, d, geom, bvh, use_pallas=True,
            pallas_interpret=not pallas_bvh.on_tpu(),
        )
    return intersect_bvh(o, d, geom, bvh)


def intersect_shade(o, d, geom: Geometry, bvh: Bvh, mode: str = "auto",
                    t_cap=None, occlusion: bool = False):
    """(Hit, ShadePoint) fused — hit attributes are selected inside the
    intersection fold/flush, never gathered from prim tables afterwards.

    `t_cap` (N,) caps the nearest-hit search: hits at t >= t_cap are
    reported as misses. Shadow rays pass light_distance + EPS so the BVH
    traversal prunes every subtree beyond the light (`scene.rs:127-131`
    only needs |t - dist| <= EPS) — identical results, far less work.
    `occlusion=True` (requires t_cap) additionally lets a lane STOP once
    any hit below t_cap - 4*EPS is found — that hit settles the verdict as
    occluded regardless of the true nearest (brute force ignores this; it
    streams all prims either way).
    """
    backend = _resolve(geom, bvh, mode)
    if backend == "brute":
        return intersect_shade_brute(o, d, geom, t_cap=t_cap)
    if backend == "pallas":
        from . import pallas_bvh

        return intersect_bvh(
            o, d, geom, bvh, want_shade=True, use_pallas=True,
            pallas_interpret=not pallas_bvh.on_tpu(), t_cap=t_cap,
            occlusion=occlusion,
        )
    return intersect_bvh(o, d, geom, bvh, want_shade=True, t_cap=t_cap,
                         occlusion=occlusion)


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
            is_tri[..., None], take_rows(geom.tri_n, tid), normal
        )
        mat = jnp.where(is_tri, take_rows(geom.tri_mat, tid), mat)
    if ns:
        sid = jnp.clip(prim - nt, 0, ns - 1)
        c = take_rows(geom.sph_c, sid)
        sn = vec.safe_normalize(pos - c)
        normal = jnp.where(is_tri[..., None], normal, sn)
        mat = jnp.where(is_tri, mat, take_rows(geom.sph_mat, sid))

    mat = jnp.where(hitmask, mat, -1)
    # Miss lanes get a unit dummy normal: downstream basis construction and
    # its backward pass must stay NaN-free even on dead lanes.
    normal = jnp.where(
        hitmask[..., None], normal, jnp.array([0.0, 0.0, 1.0], normal.dtype)
    )
    return ShadePoint(position=pos, normal=normal, mat=mat, hit=hitmask)
