"""Fused Pallas bounce-step kernel: intersect + shade + NEE + BSDF-sample
for brute-force scenes, entirely in VMEM.

The north star mandates ray-gen, traversal, intersection, BSDF sampling,
NEE and accumulation "each run as Pallas kernels over SoA ray/hit queues".
This kernel goes further and FUSES the whole per-bounce transition
(`integrator/wavefront.py:make_bounce_step`, the TPU form of the
reference's hot recursion `scene.rs:38-46,78-151`) into one Pallas program:

  * nearest-hit + shade attributes: statically-unrolled Möller-Trumbore /
    sphere tests over the scene's prim tables (the brute-force regime —
    small scenes where the XLA path also streams all prims),
  * sky-on-miss, front-face emission, Russian roulette,
  * NEE: area-proportional light pick, point-on-light sampling, a SECOND
    unrolled shadow intersection, and the no-MIS contribution,
  * BSDF sample/eval/coef over all five material families (absent families
    statically pruned via `settings.mat_types`),
  * pcg4d RNG evaluated in-kernel (bit-identical streams to ops/rng.py).

Motivation (round-3 roofline, `roofline_achieved.json`): the XLA bounce
step ran at 3.7% of VPU speed-of-light with ~97% of issue slots going to
layout/bookkeeping ops XLA could not fuse away. Here every intermediate is
a dense (8, 128) f32 tile and every table access is a scalar read at a
static index — there is no layout work at all. Measured result:
FUSED_BOUNCE.json (tools/bench_fused.py).

Scope/gating (`supported`): prim count <= FUSED_NMAX (static unroll),
uniform sky, light count <= FUSED_LMAX, material table <= FUSED_MMAX rows.
Everything else (big meshes, IBL, many lights) keeps the XLA/packet-kernel
path. Forward renderer only: the differentiable path keeps the XLA step
(its gradients flow through jax.checkpoint + the detached-sampling VJPs).

Parity is gated per-lane against the XLA step (tests/test_fused_bounce.py
in interpreter mode; tools/bench_fused.py on hardware).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import EPS, INF, PI
from ..scene.data import (
    MAT_BLINN_PHONG,
    MAT_GGX,
    MAT_LAMBERT,
    MAT_PHONG,
    MAT_REFRACTION,
    SKY_UNIFORM,
)

SUB = 8
LANE = 128
PACKET = SUB * LANE

FUSED_NMAX = 64  # max prims (tris + spheres): fully unrolled intersection
FUSED_LMAX = 8  # max NEE light prims: unrolled CDF pick
FUSED_MMAX = 16  # max material rows: unrolled one-hot param select

_ALL_TYPES = (MAT_LAMBERT, MAT_PHONG, MAT_BLINN_PHONG, MAT_GGX,
              MAT_REFRACTION)

# RNG purpose slots — must match integrator/wavefront.py.
_SLOTS = 8
_SCATTER = 0
_NEE = 1


def on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def supported(scene, settings) -> bool:
    """Whether this (scene, settings) pair is servable by the fused kernel
    with results matching the XLA bounce step."""
    nt = scene.geometry.tri_p0.shape[0]
    ns = scene.geometry.sph_c.shape[0]
    if nt + ns == 0 or nt + ns > FUSED_NMAX:
        return False
    if settings.sky_kind != SKY_UNIFORM:
        return False
    if settings.integrator not in ("pt", "pt-direct"):
        return False
    # Must be the brute-force regime the kernel replicates (mode 'bvh' or
    # 'pallas' forced by the user would traverse instead).
    if settings.intersector not in ("auto", "brute"):
        return False
    if settings.integrator == "pt-direct" and settings.has_lights:
        if scene.lights.prim.shape[0] > FUSED_LMAX:
            return False
    if scene.materials.type_id.shape[0] > FUSED_MMAX:
        return False
    return True


def enabled(scene, settings) -> bool:
    flag = os.environ.get("LLR_FUSED", "auto")
    if flag == "0" or getattr(settings, "fused", "auto") == "off":
        return False
    force = flag == "1" or getattr(settings, "fused", "auto") == "on"
    if not (force or on_tpu()):
        return False
    return supported(scene, settings)


# ---------------------------------------------------------------------------
# Component-tuple vector helpers ((SUB, LANE) tiles per component)
# ---------------------------------------------------------------------------


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _neg(a):
    return (-a[0], -a[1], -a[2])


def _scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _where3(m, a, b):
    return (
        jnp.where(m, a[0], b[0]),
        jnp.where(m, a[1], b[1]),
        jnp.where(m, a[2], b[2]),
    )


def _norm(a):
    return jnp.sqrt(jnp.maximum(_dot(a, a), 0.0))


def _safe_normalize(a, eps=1e-20):
    inv = 1.0 / jnp.maximum(_norm(a), eps)
    return _scale(a, inv)


def _orienting(out3, n3):
    """Flip n to face out's hemisphere (vec.orienting_normal)."""
    flip = _dot(n3, out3) < 0.0
    return _where3(flip, _neg(n3), n3)


def _onb(w3):
    """(tangent, binormal) with the reference's EPS branch (vec.orthonormal_basis)."""
    use_y = jnp.abs(w3[0]) > EPS
    zero = jnp.zeros_like(w3[0])
    one = jnp.ones_like(w3[0])
    a3 = (jnp.where(use_y, zero, one), jnp.where(use_y, one, zero), zero)
    t3 = _safe_normalize(_cross(a3, w3))
    b3 = _cross(w3, t3)
    return t3, b3


def _reflect(v3, n3):
    s = 2.0 * _dot(v3, n3)
    return _sub(_scale(n3, s), v3)


def _refract(v3, n3, eta):
    dn = _dot(v3, n3)
    cos2 = 1.0 - eta * eta * (1.0 - dn * dn)
    valid = cos2 > 0.0
    safe = jnp.sqrt(jnp.where(valid, cos2, 1.0))
    r3 = _sub(_scale(v3, -eta), _scale(n3, eta * -dn + safe))
    return r3, valid


# ---------------------------------------------------------------------------
# In-kernel pcg4d RNG (bit-identical to ops/rng.py)
#
# Mosaic has no uint32 <-> f32 conversion, so the mixer runs in INT32:
# wrapping mul/add/xor are bit-identical to uint32, the logical right
# shifts are emulated as arithmetic-shift + mask, and the final 24-bit
# mantissa is a non-negative int32 whose f32 conversion is exact.
# ---------------------------------------------------------------------------

_U24 = 1.0 / (1 << 24)
_M = 1664525
_INC = 1013904223


def _as_i32(u: int) -> int:
    u &= 0xFFFFFFFF
    return u - (1 << 32) if u >= (1 << 31) else u


# v3's whole LCG step is constant-foldable: 0xB5297A4D * m + inc (mod 2^32).
_V3 = _as_i32(0xB5297A4D * _M + _INC)


def _pcg4d_uniform4(lane_i32, ctr_i32, seed_i32):
    m = jnp.int32(_M)
    inc = jnp.int32(_INC)
    v = [
        lane_i32 * m + inc,
        ctr_i32 * m + inc,
        seed_i32 * m + inc,
        jnp.int32(_V3),
    ]
    for it in range(2):
        v[0] = v[0] + v[1] * v[3]
        v[1] = v[1] + v[2] * v[0]
        v[2] = v[2] + v[0] * v[1]
        v[3] = v[3] + v[1] * v[2]
        if it == 0:
            # logical >> 16 on int32: arithmetic shift then mask.
            v = [x ^ ((x >> 16) & jnp.int32(0xFFFF)) for x in v]
    to_f = lambda x: ((x >> 8) & jnp.int32(0xFFFFFF)).astype(jnp.float32) * _U24
    return to_f(v[0]), to_f(v[1]), to_f(v[2]), to_f(v[3])


# ---------------------------------------------------------------------------
# BSDF families on component tiles (transcribed from ops/bsdf.py; every
# guard preserved so masked branches stay NaN-free)
# ---------------------------------------------------------------------------


def _signed_mod(b, m):
    return jnp.where(b > 0.0, jnp.mod(b, m), m - jnp.mod(-b, m))


def _checker(u, v):
    lw, li = 2.0, 150.0
    sw, si = 1.0, 30.0
    cw, ci = 150.0, 300.0
    lu, lv = _signed_mod(u, li), _signed_mod(v, li)
    su, sv = _signed_mod(u, si), _signed_mod(v, si)
    cu, cv = _signed_mod(u, ci), _signed_mod(v, ci)
    big_line = (lu < lw) | (lv < lw)
    small_line = (su < sw) | (sv < sw)
    cell = ((cu < cw) | (cv < cw)) & ~((cu < cw) & (cv < cw))
    out = jnp.where(cell, 0.8, 1.0)
    out = jnp.where(small_line, 0.6, out)
    out = jnp.where(big_line, 0.5, out)
    return out


def _pow_clamped(base, e):
    return jnp.where(base > 0.0, jnp.power(jnp.maximum(base, 1e-30), e), 0.0)


def _ggx_g1(v3, n3, a2):
    cos = _dot(v3, n3)
    tan2 = 1.0 / jnp.maximum(cos * cos, 1e-20) - 1.0
    return 2.0 / (1.0 + jnp.sqrt(1.0 + a2 * a2 * tan2 * tan2))


def _ggx_ndf(m3, n3, a2):
    mdn = _dot(m3, n3)
    x = (a2 * a2 - 1.0) * mdn * mdn + 1.0
    x = jnp.where(x != 0.0, x, 1.0)
    return a2 * a2 / (PI * x * x)


def _schlick_f0(ior):
    nnn = 1.0 - ior
    nnp = 1.0 + ior
    return (nnn * nnn) / (nnp * nnp)


def _fresnel_exact(n1, n2, out3, in3, on3):
    cos1 = _dot(out3, on3)
    cos2 = _dot(in3, _neg(on3))
    rs = ((n1 * cos1 - n2 * cos2) / (n1 * cos1 + n2 * cos2)) ** 2
    rp = ((n1 * cos2 - n2 * cos1) / (n1 * cos2 + n2 * cos1)) ** 2
    return (rs + rp) / 2.0


def _ior_pair(out3, n3, ior):
    entering = _dot(out3, n3) > 0.0
    from_ior = jnp.where(entering, 1.0, ior)
    to_ior = jnp.where(entering, ior, 1.0)
    return from_ior, to_ior


def _eval_brdf(m, out3, in3, n3, posx, posz, present):
    """ops/bsdf.py:eval_brdf on component tiles. m: dict of param tiles."""
    on3 = _orienting(out3, n3)
    i_dot_on = _dot(in3, on3)
    front = i_dot_on > 0.0
    t = m["type"]
    zero = jnp.zeros_like(t)
    f3 = (zero, zero, zero)
    need_h = MAT_BLINN_PHONG in present or MAT_GGX in present
    h3 = _safe_normalize(_add(in3, out3)) if need_h else None

    if MAT_LAMBERT in present:
        ck = _checker(posx, posz) / PI
        fl = _scale(m["col"], ck)
        f3 = _where3(t == MAT_LAMBERT, fl, f3)

    if MAT_PHONG in present:
        r3 = _reflect(out3, on3)
        cos_ph = _dot(r3, in3)
        s = (m["alpha"] + 2.0) / (2.0 * PI) * _pow_clamped(cos_ph, m["alpha"])
        fp = _scale(m["col"], jnp.where(front, s, 0.0))
        f3 = _where3(t == MAT_PHONG, fp, f3)

    if MAT_BLINN_PHONG in present:
        cos_bl = _dot(h3, on3)
        a = m["alpha"]
        s = (
            (a + 2.0) * (a + 4.0)
            / (8.0 * PI * (jnp.exp2(-a / 2.0) + a))
            * _pow_clamped(cos_bl, a)
        )
        fb = _scale(m["col"], jnp.where(front, s, 0.0))
        f3 = _where3(t == MAT_BLINN_PHONG, fb, f3)

    if MAT_GGX in present:
        a2 = m["alpha"] * m["alpha"]
        f0 = _schlick_f0(m["ior"])
        fr_s = f0 + (1.0 - f0) * (1.0 - _dot(in3, h3)) ** 5
        g = _ggx_g1(in3, on3, a2) * _ggx_g1(out3, on3, a2)
        d_ndf = _ggx_ndf(h3, on3, a2)
        denom = 4.0 * i_dot_on * _dot(out3, on3)
        s = fr_s * g * d_ndf / jnp.where(denom != 0.0, denom, 1.0)
        fg = _scale(m["col"], jnp.where(front, s, 0.0))
        f3 = _where3(t == MAT_GGX, fg, f3)

    if MAT_REFRACTION in present:
        from_ior, to_ior = _ior_pair(out3, n3, m["ior"])
        eta = from_ior / to_ior
        refr3, valid = _refract(out3, on3, eta)
        fr = _fresnel_exact(from_ior, to_ior, out3, refr3, on3)
        i_dot_n = _dot(in3, n3)
        inv_idn = 1.0 / jnp.where(i_dot_n != 0.0, i_dot_n, 1.0)
        ft = (1.0 - fr) * (to_ior / from_ior) ** 2
        w_refl = jnp.where(i_dot_on > 0.0, fr, ft)
        s = jnp.where(valid, w_refl, 1.0) * inv_idn
        fr3 = _scale(m["col"], s)
        f3 = _where3(t == MAT_REFRACTION, fr3, f3)
    return f3


def _sample_bsdf(m, out3, n3, r1u, r2u, r3u, present):
    """ops/bsdf.py:sample on component tiles -> (d3, pdf)."""
    on3 = _orienting(out3, n3)
    t = m["type"]
    zero = jnp.zeros_like(t)
    d3 = (zero, zero, zero)
    pdf = zero

    need_basis = any(
        k in present for k in (MAT_LAMBERT, MAT_BLINN_PHONG, MAT_GGX)
    )
    if need_basis:
        u3, v3 = _onb(on3)
    if present != (MAT_REFRACTION,):
        phi = 2.0 * PI * r1u
        cp, sp = jnp.cos(phi), jnp.sin(phi)

    if MAT_LAMBERT in present:
        r2s = jnp.sqrt(r2u)
        dl = _add(
            _add(_scale(u3, cp * r2s), _scale(v3, sp * r2s)),
            _scale(on3, jnp.sqrt(1.0 - r2u)),
        )
        pdf_l = _dot(dl, n3) / PI  # geometric n (lambert.rs:47-50)
        d3 = _where3(t == MAT_LAMBERT, dl, d3)
        pdf = jnp.where(t == MAT_LAMBERT, pdf_l, pdf)

    if MAT_PHONG in present:
        a = m["alpha"]
        r3 = _reflect(out3, on3)
        ur3, vr3 = _onb(r3)
        t_ph = jnp.power(r2u, 1.0 / (a + 2.0))
        ts_ph = jnp.sqrt(jnp.maximum(1.0 - t_ph * t_ph, 0.0))
        dp = _add(
            _add(_scale(ur3, cp * ts_ph), _scale(vr3, sp * ts_ph)),
            _scale(r3, t_ph),
        )
        cos_ph = _dot(r3, dp)
        pdf_p = (a + 2.0) / (2.0 * PI) * _pow_clamped(cos_ph, a)
        d3 = _where3(t == MAT_PHONG, dp, d3)
        pdf = jnp.where(t == MAT_PHONG, pdf_p, pdf)

    if MAT_BLINN_PHONG in present:
        a = m["alpha"]
        t_bl = jnp.power(r2u, 1.0 / (a + 2.0))
        ts_bl = jnp.sqrt(jnp.maximum(1.0 - t_bl * t_bl, 0.0))
        h3 = _add(
            _add(_scale(u3, cp * ts_bl), _scale(v3, sp * ts_bl)),
            _scale(on3, t_bl),
        )
        db = _sub(_scale(h3, 2.0 * _dot(out3, h3)), out3)
        pdf_b = (a + 2.0) / (2.0 * PI) * _pow_clamped(_dot(on3, h3), a)
        d3 = _where3(t == MAT_BLINN_PHONG, db, d3)
        pdf = jnp.where(t == MAT_BLINN_PHONG, pdf_b, pdf)

    if MAT_GGX in present:
        a2 = m["alpha"] * m["alpha"]
        tan = a2 * jnp.sqrt(r2u / jnp.maximum(1.0 - r2u, 1e-12))
        x = 1.0 + tan * tan
        inv_sx = 1.0 / jnp.sqrt(x)
        cos_g = inv_sx
        sin_g = tan * inv_sx
        h3 = _add(
            _add(_scale(u3, cp * sin_g), _scale(v3, sp * sin_g)),
            _scale(on3, cos_g),
        )
        o_h = _dot(out3, h3)
        dg = _sub(_scale(h3, 2.0 * o_h), out3)
        pdf_g = (
            _ggx_ndf(h3, on3, a2) * _dot(h3, on3)
            / (4.0 * jnp.where(o_h != 0.0, o_h, 1.0))
        )
        d3 = _where3(t == MAT_GGX, dg, d3)
        pdf = jnp.where(t == MAT_GGX, pdf_g, pdf)

    if MAT_REFRACTION in present:
        from_ior, to_ior = _ior_pair(out3, n3, m["ior"])
        refr3, valid = _refract(out3, on3, from_ior / to_ior)
        fr = _fresnel_exact(from_ior, to_ior, out3, refr3, on3)
        refl3 = _reflect(out3, on3)
        choose_refl = r3u < fr
        dr = _where3(valid, _where3(choose_refl, refl3, refr3), refl3)
        pdf_r = jnp.where(valid, jnp.where(choose_refl, fr, 1.0 - fr), 1.0)
        d3 = _where3(t == MAT_REFRACTION, dr, d3)
        pdf = jnp.where(t == MAT_REFRACTION, pdf_r, pdf)

    return d3, pdf


def _coef3(m, out3, n3, dist, present):
    """ops/bsdf.py:coef on component tiles."""
    one = jnp.ones_like(dist)
    if MAT_REFRACTION not in present:
        return (one, one, one)
    exiting = _dot(out3, n3) < 0.0
    ad = m["absorb"] * dist
    absorb = tuple(jnp.exp(-(1.0 - m["col"][c]) * ad) for c in range(3))
    use = exiting & (m["type"] == MAT_REFRACTION)
    return _where3(use, absorb, (one, one, one))


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _intersect_all(tt, st, o3, d3, t_init, nt: int, ns: int):
    """Statically-unrolled brute nearest-hit over the prim tables.

    Same math / EPS semantics / first-wins tie-break order as
    `ops/intersect.py:intersect_shade_brute` (tris ascending, then spheres
    ascending; strict < update). Returns (t, hit, mat_f, n3, sc3, is_sph)
    — sphere winners carry their center; the caller derives the normal.
    """
    ox, oy, oz = o3
    dx, dy, dz = d3
    best_t = t_init
    zero = jnp.zeros_like(best_t)
    best_mat = zero - 1.0
    best_nx, best_ny, best_nz = zero, zero, zero
    best_cx, best_cy, best_cz = zero, zero, zero
    # Mosaic cannot materialize bool tiles (i8<->i1 casts); flags are f32.
    best_sph = zero  # 1.0 where the winner is a sphere

    for i in range(nt):
        p0x, p0y, p0z = tt[i, 0], tt[i, 1], tt[i, 2]
        e1x, e1y, e1z = tt[i, 3], tt[i, 4], tt[i, 5]
        e2x, e2y, e2z = tt[i, 6], tt[i, 7], tt[i, 8]
        # Möller-Trumbore, scalar-tri x vector-rays (same as `_tri_t_T`).
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
            & (t >= EPS)
        )
        upd = ok & (t < best_t)
        best_t = jnp.where(upd, t, best_t)
        best_mat = jnp.where(upd, tt[i, 12], best_mat)
        best_nx = jnp.where(upd, tt[i, 9], best_nx)
        best_ny = jnp.where(upd, tt[i, 10], best_ny)
        best_nz = jnp.where(upd, tt[i, 11], best_nz)
        best_sph = jnp.where(upd, 0.0, best_sph)

    for i in range(ns):
        cx, cy, cz, r = st[i, 0], st[i, 1], st[i, 2], st[i, 3]
        cox, coy, coz = ox - cx, oy - cy, oz - cz
        cod = cox * dx + coy * dy + coz * dz
        det = cod * cod - (cox * cox + coy * coy + coz * coz) + r * r
        sq = jnp.sqrt(jnp.where(det > 0.0, det, 1.0))
        t1 = -cod - sq
        t2 = -cod + sq
        t = jnp.where(t1 > EPS, t1, t2)
        ok = (det > 0.0) & (t > EPS)
        upd = ok & (t < best_t)
        best_t = jnp.where(upd, t, best_t)
        best_mat = jnp.where(upd, st[i, 4], best_mat)
        best_cx = jnp.where(upd, cx, best_cx)
        best_cy = jnp.where(upd, cy, best_cy)
        best_cz = jnp.where(upd, cz, best_cz)
        best_sph = jnp.where(upd, 1.0, best_sph)

    hit = best_mat >= 0.0
    return (
        best_t, hit, best_mat,
        (best_nx, best_ny, best_nz),
        (best_cx, best_cy, best_cz),
        best_sph,
    )


def _shade_winner(o3, d3, t, hit, n3, sc3, is_sph, ns: int):
    """Winner position + outward normal (dummy (0,0,1) on miss — matches
    intersect_shade_brute)."""
    pos3 = _add(o3, _scale(d3, t))
    if ns:
        sn3 = _safe_normalize(_sub(pos3, sc3))
        n3 = _where3(is_sph > 0.5, sn3, n3)
    zero = jnp.zeros_like(t)
    n3 = _where3(hit, n3, (zero, zero, zero + 1.0))
    return pos3, n3


def _gather_mat(mt, mat_f, nm: int, present):
    """Per-lane material params by unrolled one-hot over the table rows
    (clamped to row 0 for miss lanes, like bsdf.gather)."""
    i = jnp.maximum(mat_f, 0.0)
    zero = jnp.zeros_like(mat_f)
    m = {
        "type": zero, "col": (zero, zero, zero),
        "emi": (zero, zero, zero), "alpha": zero, "ior": zero,
        "absorb": zero,
    }
    for row in range(nm):
        sel = i == float(row)
        m["type"] = jnp.where(sel, mt[row, 0], m["type"])
        m["col"] = _where3(
            sel, (mt[row, 1], mt[row, 2], mt[row, 3]), m["col"]
        )
        m["emi"] = _where3(
            sel, (mt[row, 4], mt[row, 5], mt[row, 6]), m["emi"]
        )
        m["alpha"] = jnp.where(sel, mt[row, 7], m["alpha"])
        if MAT_GGX in present or MAT_REFRACTION in present:
            m["ior"] = jnp.where(sel, mt[row, 8], m["ior"])
        if MAT_REFRACTION in present:
            m["absorb"] = jnp.where(sel, mt[row, 9], m["absorb"])
    return m


def _bounce_kernel(
    bounce_ref, seed_ref,  # SMEM scalars
    tt_ref, st_ref, mt_ref, lt_ref, misc_ref,  # VMEM tables
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    tr_ref, tg_ref, tb_ref, ar_ref, ag_ref, ab_ref,
    alive_ref, lane_ref,
    # outputs
    oox_ref, ooy_ref, ooz_ref, odx_ref, ody_ref, odz_ref,
    otr_ref, otg_ref, otb_ref, oar_ref, oag_ref, oab_ref,
    oalive_ref, orays_ref,
    *, nt: int, ns: int, nm: int, nl: int, nee: bool, has_lights: bool,
    no_direct_emitter: bool, depth: int, depth_limit: int, present: tuple,
):
    o3 = (ox_ref[:], oy_ref[:], oz_ref[:])
    d3 = (dx_ref[:], dy_ref[:], dz_ref[:])
    thr3 = (tr_ref[:], tg_ref[:], tb_ref[:])
    acc3 = (ar_ref[:], ag_ref[:], ab_ref[:])
    alive = alive_ref[:] != 0
    lane = lane_ref[:]
    bounce = bounce_ref[0, 0]
    seed = seed_ref[0, 0]  # int32 bit-pattern of the uint32 seed
    ctr0 = bounce * _SLOTS  # int32; bit-identical to the uint32 counter

    inf_t = jnp.full((SUB, LANE), INF, jnp.float32)
    t, hit_any, mat_f, n3, sc3, is_sph = _intersect_all(
        tt_ref, st_ref, o3, d3, inf_t, nt, ns
    )
    pos3, n3 = _shade_winner(o3, d3, t, hit_any, n3, sc3, is_sph, ns)

    # Per-lane ray count this bounce: a main ray per entry-alive lane.
    rays = jnp.where(alive, 1.0, 0.0)

    # Sky on miss (uniform sky only; gated in `supported`).
    sky3 = (misc_ref[0, 0], misc_ref[0, 1], misc_ref[0, 2])
    missed = alive & ~hit_any
    acc3 = _where3(
        missed,
        _add(acc3, (thr3[0] * sky3[0], thr3[1] * sky3[1], thr3[2] * sky3[2])),
        acc3,
    )
    alive = alive & hit_any

    m = _gather_mat(mt_ref, mat_f, nm, present)
    out3 = _neg(d3)

    # Emission (front faces only; depth-0 gating; no MIS past depth 0).
    front = _dot(out3, n3) > 0.0
    if nee:
        if no_direct_emitter:
            emit_mask = None  # statically zero
        else:
            emit_mask = alive & front & (bounce == 0)
    else:
        if no_direct_emitter:
            emit_mask = alive & front & (bounce != 0)
        else:
            emit_mask = alive & front
    if emit_mask is not None:
        acc3 = _where3(
            emit_mask,
            _add(acc3, (thr3[0] * m["emi"][0], thr3[1] * m["emi"][1],
                        thr3[2] * m["emi"][2])),
            acc3,
        )

    # One mixer call: RR + three BSDF draws (slot _SCATTER).
    u_rr, r1, r2, r3u = _pcg4d_uniform4(lane, ctr0 + _SCATTER, seed)

    # Russian roulette (`scene.rs:64-76` policy via wavefront._russian_roulette).
    prob = jnp.maximum(jnp.maximum(m["col"][0], m["col"][1]), m["col"][2])
    over = jnp.maximum(bounce - depth_limit, 0).astype(jnp.float32)
    prob = prob * jnp.exp2(-over)
    prob = jnp.where((bounce <= depth) & (prob > 0.0), 1.0, prob)
    cont = (prob == 1.0) | (u_rr < prob)
    alive = alive & cont
    inv_prob = 1.0 / jnp.maximum(prob, 1e-12)
    thr3 = _scale(thr3, inv_prob)

    # NEE (`scene.rs:104-151`).
    if nee and has_lights:
        u_pick, u1, u2, _ = _pcg4d_uniform4(lane, ctr0 + _NEE, seed)
        total_area = misc_ref[0, 3]
        roulette = total_area * u_pick
        li = jnp.zeros((SUB, LANE), jnp.float32)
        for row in range(nl):
            li = li + jnp.where(lt_ref[row, 14] < roulette, 1.0, 0.0)
        li = jnp.clip(li, 0.0, float(nl - 1))
        zero = jnp.zeros((SUB, LANE), jnp.float32)
        l_is_tri = zero  # f32 flag (see _intersect_all note)
        lp0 = (zero, zero, zero)
        le1 = (zero, zero, zero)
        le2 = (zero, zero, zero)
        lc = (zero, zero, zero)
        lr = zero
        for row in range(nl):
            sel = li == float(row)
            l_is_tri = jnp.where(sel, lt_ref[row, 0], l_is_tri)
            lp0 = _where3(sel, (lt_ref[row, 1], lt_ref[row, 2], lt_ref[row, 3]), lp0)
            le1 = _where3(sel, (lt_ref[row, 4], lt_ref[row, 5], lt_ref[row, 6]), le1)
            le2 = _where3(sel, (lt_ref[row, 7], lt_ref[row, 8], lt_ref[row, 9]), le2)
            lc = _where3(sel, (lt_ref[row, 10], lt_ref[row, 11], lt_ref[row, 12]), lc)
            lr = jnp.where(sel, lt_ref[row, 13], lr)
        # Triangle point: min/max trick (`triangle.rs:140-149`).
        mn = jnp.minimum(u1, u2)
        mx = jnp.maximum(u1, u2)
        p_tri = _add(
            _add(_scale(lp0, mn), _scale(_add(lp0, le1), 1.0 - mx)),
            _scale(_add(lp0, le2), mx - mn),
        )
        # Sphere point: uniform over the FULL sphere (quirk #10).
        phi_l = 2.0 * PI * u1
        z = u2 * 2.0 - 1.0
        zs = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        p_sph = _add(lc, _scale((jnp.cos(phi_l) * zs, jnp.sin(phi_l) * zs, z), lr))
        lpoint = _where3(l_is_tri > 0.0, p_tri, p_sph)
        pdf_l = 1.0 / total_area

        path3 = _sub(lpoint, pos3)
        dist = _norm(path3)
        wi3 = _scale(path3, 1.0 / jnp.maximum(dist, 1e-20))
        pn3 = _orienting(out3, n3)
        cos_p = _dot(wi3, pn3)
        ok = cos_p > 0.0
        not_emitter = _dot(m["emi"], m["emi"]) <= 0.0
        ok = ok & not_emitter

        # Shadow query, capped at dist + 2*EPS (same contract as the XLA
        # brute path: occlusion verdict |t - dist| <= EPS).
        s_t, s_hit, s_mat, s_n3, s_sc3, s_sph = _intersect_all(
            tt_ref, st_ref, pos3, wi3, dist + 2.0 * EPS, nt, ns
        )
        s_pos3, s_n3 = _shade_winner(pos3, wi3, s_t, s_hit, s_n3, s_sc3,
                                     s_sph, ns)
        visible = s_hit & (jnp.abs(s_t - dist) <= EPS)
        ok = ok & visible
        light_cos = _dot(_neg(wi3), s_n3)
        ok = ok & (light_cos > 0.0)

        g = cos_p * light_cos / jnp.maximum(_dot(path3, path3), 1e-20)
        f3 = _eval_brdf(m, out3, wi3, pn3, pos3[0], pos3[2], present)
        sm = _gather_mat(mt_ref, s_mat, nm, present)
        gp = g / pdf_l
        contrib3 = tuple(f3[c] * sm["emi"][c] * gp for c in range(3))
        mask = alive & ok
        acc3 = _where3(
            mask,
            _add(acc3, (thr3[0] * contrib3[0], thr3[1] * contrib3[1],
                        thr3[2] * contrib3[2])),
            acc3,
        )
        rays = rays + jnp.where(alive, 1.0, 0.0)  # shadow rays

    # BSDF sampling + throughput update (`scene.rs:78-102`).
    sd3, pdf = _sample_bsdf(m, out3, n3, r1, r2, r3u, present)
    f3 = _eval_brdf(m, out3, sd3, n3, pos3[0], pos3[2], present)
    cf3 = _coef3(m, out3, n3, t, present)
    cos = _dot(sd3, n3)
    wscale = cos / jnp.where(pdf != 0.0, pdf, 1.0)
    w3 = tuple(f3[c] * cf3[c] * wscale for c in range(3))
    thr3 = _where3(
        alive,
        (thr3[0] * w3[0], thr3[1] * w3[1], thr3[2] * w3[2]),
        thr3,
    )
    w_nonzero = (w3[0] != 0.0) | (w3[1] != 0.0) | (w3[2] != 0.0)
    alive = alive & w_nonzero & (pdf != 0.0)

    new_o3 = _where3(alive, pos3, o3)
    new_d3 = _where3(alive, sd3, d3)
    # Dead lanes keep their previous throughput (PathState contract).
    out_thr3 = _where3(alive, thr3, (tr_ref[:], tg_ref[:], tb_ref[:]))

    oox_ref[:], ooy_ref[:], ooz_ref[:] = new_o3
    odx_ref[:], ody_ref[:], odz_ref[:] = new_d3
    otr_ref[:], otg_ref[:], otb_ref[:] = out_thr3
    oar_ref[:], oag_ref[:], oab_ref[:] = acc3
    oalive_ref[:] = jnp.where(alive, jnp.int32(1), jnp.int32(0))
    orays_ref[:] = rays


# ---------------------------------------------------------------------------
# Host-side wrapper
# ---------------------------------------------------------------------------


def _pack_tables(scene, present):
    """Tiny per-scene tables with every field at a STATIC lane offset.

    f32 throughout — prim/material ids are exact in f32 far beyond any
    realistic table size (< 2^24)."""
    g = scene.geometry
    f32 = jnp.float32
    nt = g.tri_p0.shape[0]
    ns = g.sph_c.shape[0]
    if nt:
        tt = jnp.concatenate(
            [g.tri_p0, g.tri_e1, g.tri_e2, g.tri_n,
             g.tri_mat.astype(f32)[:, None],
             jnp.zeros((nt, 3), f32)],
            axis=1,
        )  # (nt, 16)
    else:
        tt = jnp.zeros((1, 16), f32)
    if ns:
        st = jnp.concatenate(
            [g.sph_c, g.sph_r[:, None], g.sph_mat.astype(f32)[:, None],
             jnp.zeros((ns, 3), f32)],
            axis=1,
        )  # (ns, 8)
    else:
        st = jnp.zeros((1, 8), f32)
    mats = scene.materials
    nm = mats.type_id.shape[0]
    mt = jnp.concatenate(
        [mats.type_id.astype(f32)[:, None], mats.color, mats.emission,
         mats.alpha[:, None], mats.ior[:, None],
         mats.absorbtance[:, None], jnp.zeros((nm, 6), f32)],
        axis=1,
    )  # (nm, 16)
    lights = scene.lights
    nl = lights.prim.shape[0]
    lt = jnp.concatenate(
        [lights.is_tri.astype(f32)[:, None], lights.p0, lights.e1,
         lights.e2, lights.c, lights.r[:, None], lights.cdf[:, None],
         jnp.zeros((nl, 1), f32)],
        axis=1,
    )  # (nl, 16): is_tri | p0 | e1 | e2 | c | r | cdf
    misc = jnp.concatenate(
        [scene.sky.color.astype(f32),
         jnp.reshape(lights.total_area.astype(f32), (1,)),
         jnp.zeros((4,), f32)]
    )[None, :]  # (1, 8): sky rgb | total_area
    return tt, st, mt, lt, misc


@functools.lru_cache(maxsize=None)
def _make_call(nt, ns, nm, nl, nee, has_lights, no_direct_emitter, depth,
               depth_limit, present, interpret):
    kernel = functools.partial(
        _bounce_kernel, nt=nt, ns=ns, nm=nm, nl=nl, nee=nee,
        has_lights=has_lights, no_direct_emitter=no_direct_emitter,
        depth=depth, depth_limit=depth_limit, present=present,
    )

    def call(bounce, seed_i32, tt, st, mt, lt, misc, tiles):
        rows = tiles[0].shape[0]
        grid = (rows // SUB,)
        smem = pl.BlockSpec(
            (1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM
        )
        table = lambda a: pl.BlockSpec(
            a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        tile = pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        out_dtypes = [jnp.float32] * 12 + [jnp.int32, jnp.float32]
        return pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=[
                jax.ShapeDtypeStruct((rows, LANE), dt) for dt in out_dtypes
            ],
            in_specs=(
                [smem, smem]
                + [table(a) for a in (tt, st, mt, lt, misc)]
                + [tile] * 14
            ),
            out_specs=[tile] * 14,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            jnp.reshape(jnp.asarray(bounce, jnp.int32), (1, 1)),
            jnp.reshape(seed_i32, (1, 1)),
            tt, st, mt, lt, misc, *tiles,
        )

    return call


def make_step(scene, settings, seed, interpret: bool = False):
    """Build a PathState -> PathState bounce transition running the fused
    Pallas kernel. Drop-in replacement for the XLA step built by
    `integrator/wavefront.py:make_bounce_step` (forward rendering only)."""
    from ..integrator.wavefront import PathState
    from . import rng as rng_mod

    present = settings.mat_types
    present = _ALL_TYPES if present is None else tuple(present)
    nt = scene.geometry.tri_p0.shape[0]
    ns = scene.geometry.sph_c.shape[0]
    nm = scene.materials.type_id.shape[0]
    nl = scene.lights.prim.shape[0]
    nee = settings.integrator == "pt-direct"
    call = _make_call(
        nt, ns, nm, nl, nee, settings.has_lights,
        settings.no_direct_emitter, settings.depth, settings.depth_limit,
        present, interpret,
    )
    tables = _pack_tables(scene, present)
    # int32 bit-pattern of the uint32 seed (Mosaic RNG runs in int32).
    seed_i32 = jax.lax.bitcast_convert_type(
        rng_mod._seed_u32(seed), jnp.int32
    )

    def step(state: PathState) -> PathState:
        n = state.o.shape[0]
        pad = (-n) % PACKET

        def prep(a, fill=0.0):
            if pad:
                a = jnp.concatenate(
                    [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], 0
                )
            return a

        to2d = lambda a: a.reshape(-1, LANE)
        tiles = (
            [to2d(prep(state.o[:, c])) for c in range(3)]
            + [to2d(prep(state.d[:, c], 1.0)) for c in range(3)]
            + [to2d(prep(state.throughput[:, c])) for c in range(3)]
            + [to2d(prep(state.accum[:, c])) for c in range(3)]
            + [to2d(prep(state.alive.astype(jnp.int32), 0))]
            + [to2d(prep(jax.lax.bitcast_convert_type(state.lane, jnp.int32), 0))]
        )
        outs = call(state.bounce, seed_i32, *tables, tuple(tiles))
        flat = [x.reshape(-1)[:n] for x in outs]
        o = jnp.stack(flat[0:3], axis=-1)
        d = jnp.stack(flat[3:6], axis=-1)
        thr = jnp.stack(flat[6:9], axis=-1)
        acc = jnp.stack(flat[9:12], axis=-1)
        alive = flat[12] != 0
        rays = state.rays_traced + jnp.sum(flat[13])
        return PathState(
            bounce=state.bounce + 1,
            o=o, d=d, throughput=thr, accum=acc, alive=alive,
            rays_traced=rays, lane=state.lane,
        )

    return step
