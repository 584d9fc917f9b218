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
    SKY_IBL,
    SKY_UNIFORM,
)

# Sublanes per ray tile. 8 is the Mosaic minimum; larger tiles amortize
# per-grid-step overhead. Measured on the flagship 20-chunk bench:
# SUB=8 289, 16 316, 32 330, 64 329, 128 322 M rays/s -> 32 ships.
# Override with LLR_FUSED_SUB for experiments.
SUB = int(os.environ.get("LLR_FUSED_SUB", "32"))
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


def _bounce_body(
    isect, mts_ref, mte_ref, lt_ref, misc_ref,
    in_refs, out_refs, miss_ref,
    *, ns: int, nm: int, nl: int, nee: bool, has_lights: bool,
    no_direct_emitter: bool, depth: int, depth_limit: int, present: tuple,
    ibl: bool = False,
):
    """The bounce transition over one (SUB, LANE) tile, with intersection
    abstracted: `isect(o3, d3, t_init, stop)` returns the `_intersect_all`
    tuple. Shared by the brute-table kernel (`_bounce_kernel`) and the
    BVH-walk kernel (`_bounce_kernel_bvh`). With `ibl` the sky-on-miss
    term is NOT accumulated in-kernel; instead `miss_ref` gets a 1.0 flag
    and the caller adds thr * ibl(d) outside (the equirect gather needs
    per-lane dynamic indexing Mosaic scalar reads cannot express)."""
    (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
     tr_ref, tg_ref, tb_ref, ar_ref, ag_ref, ab_ref,
     alive_ref, lane_ref, bounce_ref, seed_ref) = in_refs
    (oox_ref, ooy_ref, ooz_ref, odx_ref, ody_ref, odz_ref,
     otr_ref, otg_ref, otb_ref, oar_ref, oag_ref, oab_ref,
     oalive_ref, orays_ref) = out_refs
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
    t, hit_any, mat_f, n3, sc3, is_sph = isect(o3, d3, inf_t, None)
    pos3, n3 = _shade_winner(o3, d3, t, hit_any, n3, sc3, is_sph, ns)

    # Per-lane ray count this bounce: a main ray per entry-alive lane.
    rays = jnp.where(alive, 1.0, 0.0)

    missed = alive & ~hit_any
    if ibl:
        # IBL sky: flag the miss; the host-side epilogue adds
        # thr * ibl_radiance(d) (ops/sky.py) for flagged lanes.
        miss_ref[:] = jnp.where(missed, 1.0, 0.0)
    else:
        # Uniform sky in-kernel.
        sky3 = (misc_ref[0, 0], misc_ref[0, 1], misc_ref[0, 2])
        acc3 = _where3(
            missed,
            _add(acc3, (thr3[0] * sky3[0], thr3[1] * sky3[1],
                        thr3[2] * sky3[2])),
            acc3,
        )
    alive = alive & hit_any

    # Detached-sampling split (diff/render.py): RR probability and the
    # NEE emissive-hit early-out come from the SAMPLE table (stop-gradient
    # copy on the differentiable path); BRDF/emission evaluation from the
    # EVAL table (live params). Forward rendering passes the same array
    # twice.
    m_s = _gather_mat(mts_ref, mat_f, nm, present)
    m = _gather_mat(mte_ref, mat_f, nm, present)
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
    prob = jnp.maximum(jnp.maximum(m_s["col"][0], m_s["col"][1]), m_s["col"][2])
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
        not_emitter = _dot(m_s["emi"], m_s["emi"]) <= 0.0
        ok = ok & not_emitter

        # Shadow query, capped at dist + 2*EPS (same contract as the XLA
        # brute path: occlusion verdict |t - dist| <= EPS). BVH mode also
        # gets the occlusion early-stop at dist - 2*EPS (= cap - 4*EPS,
        # ops/intersect.py:337).
        s_t, s_hit, s_mat, s_n3, s_sc3, s_sph = isect(
            pos3, wi3, dist + 2.0 * EPS, dist - 2.0 * EPS
        )
        s_pos3, s_n3 = _shade_winner(pos3, wi3, s_t, s_hit, s_n3, s_sc3,
                                     s_sph, ns)
        visible = s_hit & (jnp.abs(s_t - dist) <= EPS)
        ok = ok & visible
        light_cos = _dot(_neg(wi3), s_n3)
        ok = ok & (light_cos > 0.0)

        g = cos_p * light_cos / jnp.maximum(_dot(path3, path3), 1e-20)
        f3 = _eval_brdf(m, out3, wi3, pn3, pos3[0], pos3[2], present)
        sm = _gather_mat(mte_ref, s_mat, nm, present)
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
    sd3, pdf = _sample_bsdf(m_s, out3, n3, r1, r2, r3u, present)
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


def _bounce_kernel(
    bounce_ref, seed_ref,  # SMEM scalars
    tt_ref, st_ref, mts_ref, mte_ref, lt_ref, misc_ref,  # VMEM tables
    *rest,
    nt: int, ns: int, nm: int, nl: int, nee: bool, has_lights: bool,
    no_direct_emitter: bool, depth: int, depth_limit: int, present: tuple,
):
    """Brute-table fused bounce (statically-unrolled intersection)."""
    in_refs = tuple(rest[:14]) + (bounce_ref, seed_ref)
    out_refs = rest[14:28]

    def isect(o3, d3, t_init, stop):
        del stop  # brute force streams every prim either way
        return _intersect_all(tt_ref, st_ref, o3, d3, t_init, nt, ns)

    _bounce_body(
        isect, mts_ref, mte_ref, lt_ref, misc_ref, in_refs, out_refs, None,
        ns=ns, nm=nm, nl=nl, nee=nee, has_lights=has_lights,
        no_direct_emitter=no_direct_emitter, depth=depth,
        depth_limit=depth_limit, present=present, ibl=False,
    )


def _sphere_pass(st, o3, d3, ns: int, best_t):
    """Sphere brute loop seeding the per-tile bests (mirrors the sphere
    half of `_intersect_all` / intersect.py:_sphere_brute)."""
    ox, oy, oz = o3
    dx, dy, dz = d3
    zero = jnp.zeros_like(best_t)
    best_mat = zero - 1.0
    best_c = (zero, zero, zero)
    for i in range(ns):
        cx, cy, cz, r = st[i, 0], st[i, 1], st[i, 2], st[i, 3]
        cox, coy, coz = ox - cx, oy - cy, oz - cz
        cod = cox * dx + coy * dy + coz * dz
        det = cod * cod - (cox * cox + coy * coy + coz * coz) + r * r
        sq = jnp.sqrt(jnp.where(det > 0.0, det, 1.0))
        t1 = -cod - sq
        t2 = -cod + sq
        tt = jnp.where(t1 > EPS, t1, t2)
        ok = (det > 0.0) & (tt > EPS)
        upd = ok & (tt < best_t)
        best_t = jnp.where(upd, tt, best_t)
        best_mat = jnp.where(upd, st[i, 4], best_mat)
        best_c = _where3(upd, (cx + zero, cy + zero, cz + zero), best_c)
    return best_t, best_mat, best_c


def _bounce_kernel_bvh(
    bounce_ref, seed_ref,  # SMEM scalars
    nodes_ref, blk_ref, pm_ref,  # resident packet-BVH tables
    st_ref, mts_ref, mte_ref, lt_ref, misc_ref,  # small tables
    *rest,
    ns: int, nm: int, nl: int, nee: bool, has_lights: bool,
    no_direct_emitter: bool, depth: int, depth_limit: int, present: tuple,
    k: int, rpb: int, rpm: int, ibl: bool,
):
    """BVH-fused bounce: the packet union walk (ops/pallas_bvh.run_walk)
    replaces the unrolled triangle loop, so BVH-scale scenes get the whole
    bounce transition in ONE Pallas program too (round-4 verdict item 2 —
    they used to run XLA glue around a bare traversal call). Spheres ride
    a brute pre-pass exactly like the XLA path (sphere best seeds the walk
    cap; tri winner must be STRICTLY closer — intersect.py:intersect_bvh
    contract, so per-lane results match that path)."""
    from . import pallas_bvh

    in_refs = tuple(rest[:14]) + (bounce_ref, seed_ref)
    out_refs = rest[14:28]
    miss_ref = rest[28] if ibl else None
    scratch = rest[28 + (1 if ibl else 0):]

    def isect(o3, d3, t_init, stop):
        zero = jnp.zeros_like(t_init)
        if ns:
            bt, bm, bc3 = _sphere_pass(st_ref, o3, d3, ns, t_init)
        else:
            bt, bm, bc3 = t_init, zero - 1.0, (zero, zero, zero)
        stop_t = (
            jnp.full((SUB, LANE), -INF, jnp.float32) if stop is None
            else stop
        )
        pallas_bvh.run_walk(
            nodes_ref, blk_ref, pm_ref,
            (o3[0], o3[1], o3[2], d3[0], d3[1], d3[2]),
            bt, stop_t, scratch,
            k=k, rpb=rpb, rpm=rpm, want_shade=True,
        )
        wt = scratch[0][:]
        wp = scratch[1][:]
        wm = scratch[2][:]
        wn3 = (scratch[3][:], scratch[4][:], scratch[5][:])
        tri_won = wp >= 0
        t = jnp.where(tri_won, wt, bt)
        mat_f = jnp.where(tri_won, wm.astype(jnp.float32), bm)
        n3 = _where3(tri_won, wn3, (zero, zero, zero))
        is_sph = jnp.where(tri_won | (bm < 0.0), 0.0, 1.0)
        hit = mat_f >= 0.0
        return t, hit, mat_f, n3, bc3, is_sph

    _bounce_body(
        isect, mts_ref, mte_ref, lt_ref, misc_ref, in_refs, out_refs,
        miss_ref,
        ns=ns, nm=nm, nl=nl, nee=nee, has_lights=has_lights,
        no_direct_emitter=no_direct_emitter, depth=depth,
        depth_limit=depth_limit, present=present, ibl=ibl,
    )


# ---------------------------------------------------------------------------
# Host-side wrapper
# ---------------------------------------------------------------------------


def _mat_table(mats):
    """(nm, 16) f32 material-parameter table (see _pack_tables)."""
    f32 = jnp.float32
    nm = mats.type_id.shape[0]
    return jnp.concatenate(
        [mats.type_id.astype(f32)[:, None], mats.color, mats.emission,
         mats.alpha[:, None], mats.ior[:, None],
         mats.absorbtance[:, None], jnp.zeros((nm, 6), f32)],
        axis=1,
    )


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
    mt = _mat_table(scene.materials)  # (nm, 16)
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

    def call(bounce, seed_i32, tt, st, mts, mte, lt, misc, tiles):
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
                + [table(a) for a in (tt, st, mts, mte, lt, misc)]
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
            tt, st, mts, mte, lt, misc, *tiles,
        )

    return call


def _state_tiles(state, pad):
    """Pad a PathState to a PACKET multiple and split into (rows, 128)
    component tiles in the kernels' input order."""
    def prep(a, fill=0.0):
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], 0
            )
        return a

    to2d = lambda a: a.reshape(-1, LANE)
    return (
        [to2d(prep(state.o[:, c])) for c in range(3)]
        + [to2d(prep(state.d[:, c], 1.0)) for c in range(3)]
        + [to2d(prep(state.throughput[:, c])) for c in range(3)]
        + [to2d(prep(state.accum[:, c])) for c in range(3)]
        + [to2d(prep(state.alive.astype(jnp.int32), 0))]
        + [to2d(prep(jax.lax.bitcast_convert_type(state.lane, jnp.int32), 0))]
    )


def _apply_fwd(call, tables, seed_i32, state):
    """Run the fused forward kernel on a PathState -> new PathState."""
    from ..integrator.wavefront import PathState

    n = state.o.shape[0]
    pad = (-n) % PACKET
    tiles = _state_tiles(state, pad)
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


def make_step(scene, settings, seed, interpret: bool = False):
    """Build a PathState -> PathState bounce transition running the fused
    Pallas kernel. Drop-in replacement for the XLA step built by
    `integrator/wavefront.py:make_bounce_step` (forward rendering only)."""
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
    tt, st, mt, lt, misc = _pack_tables(scene, present)
    # Forward rendering: sample table == eval table.
    tables = (tt, st, mt, mt, lt, misc)
    # int32 bit-pattern of the uint32 seed (Mosaic RNG runs in int32).
    seed_i32 = jax.lax.bitcast_convert_type(
        rng_mod._seed_u32(seed), jnp.int32
    )

    def step(state):
        return _apply_fwd(call, tables, seed_i32, state)

    return step


# ---------------------------------------------------------------------------
# BVH-fused bounce (packet walk inside the bounce program)
# ---------------------------------------------------------------------------


def supported_bvh(scene, settings) -> bool:
    """Whether the BVH-walk fused bounce can serve this (scene, settings):
    the triangle set must be on the resident packet-kernel path
    (ops/pallas_bvh.supported, past the 8192-prim brute crossover), with
    the same small-table limits as the brute-fused kernel. Uniform AND
    IBL skies qualify (IBL via the host-side miss epilogue)."""
    from . import pallas_bvh

    nt = scene.geometry.tri_p0.shape[0]
    ns = scene.geometry.sph_c.shape[0]
    if nt == 0 or ns > 8:
        return False
    from .intersect import _use_brute

    if _use_brute(scene.geometry, settings.intersector, scene.bvh):
        return False  # brute regime (fused-brute kernel or forced brute)
    if settings.intersector not in ("auto", "bvh", "pallas"):
        return False
    if not pallas_bvh.supported(scene.bvh):
        return False
    if settings.sky_kind not in (SKY_UNIFORM, SKY_IBL):
        return False
    if settings.integrator not in ("pt", "pt-direct"):
        return False
    if settings.integrator == "pt-direct" and settings.has_lights:
        if scene.lights.prim.shape[0] > FUSED_LMAX:
            return False
    if scene.materials.type_id.shape[0] > FUSED_MMAX:
        return False
    return True


def enabled_bvh(scene, settings) -> bool:
    flag = os.environ.get("LLR_FUSED_BVH", os.environ.get("LLR_FUSED",
                                                          "auto"))
    if flag == "0" or getattr(settings, "fused", "auto") == "off":
        return False
    force = flag == "1" or getattr(settings, "fused", "auto") == "on"
    if not (force or on_tpu()):
        return False
    return supported_bvh(scene, settings)


@functools.lru_cache(maxsize=None)
def _make_call_bvh(ns, nm, nl, nee, has_lights, no_direct_emitter, depth,
                   depth_limit, present, k, rpb, rpm, ibl, table_bytes,
                   interpret):
    kernel = functools.partial(
        _bounce_kernel_bvh, ns=ns, nm=nm, nl=nl, nee=nee,
        has_lights=has_lights, no_direct_emitter=no_direct_emitter,
        depth=depth, depth_limit=depth_limit, present=present,
        k=k, rpb=rpb, rpm=rpm, ibl=ibl,
    )

    def call(bounce, seed_i32, nodes, blk, pm, st, mts, mte, lt, misc,
             tiles):
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
        n_out = 14 + (1 if ibl else 0)
        out_dtypes = ([jnp.float32] * 12 + [jnp.int32, jnp.float32]
                      + ([jnp.float32] if ibl else []))
        scratch = [
            pltpu.VMEM((SUB, LANE), jnp.float32),
            pltpu.VMEM((SUB, LANE), jnp.int32),
            pltpu.VMEM((SUB, LANE), jnp.int32),
            pltpu.VMEM((SUB, LANE), jnp.float32),
            pltpu.VMEM((SUB, LANE), jnp.float32),
            pltpu.VMEM((SUB, LANE), jnp.float32),
        ]
        return pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=[
                jax.ShapeDtypeStruct((rows, LANE), dt) for dt in out_dtypes
            ],
            in_specs=(
                [smem, smem]
                + [table(a) for a in (nodes, blk, pm, st, mts, mte, lt,
                                      misc)]
                + [tile] * 14
            ),
            out_specs=[tile] * n_out,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=table_bytes + 8 * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            jnp.reshape(jnp.asarray(bounce, jnp.int32), (1, 1)),
            jnp.reshape(seed_i32, (1, 1)),
            nodes, blk, pm, st, mts, mte, lt, misc, *tiles,
        )

    return call


def make_step_bvh(scene, settings, seed, interpret: bool = False):
    """PathState -> PathState bounce transition for resident-BVH scenes:
    packet traversal + shading + NEE + RR fused in one Pallas program
    (forward rendering only). IBL scenes add a tiny XLA epilogue for the
    sky-on-miss term (equirect gather)."""
    from . import pallas_bvh
    from . import rng as rng_mod
    from . import sky as sky_ops
    from ..integrator.wavefront import PathState

    present = settings.mat_types
    present = _ALL_TYPES if present is None else tuple(present)
    ns = scene.geometry.sph_c.shape[0]
    nm = scene.materials.type_id.shape[0]
    nl = scene.lights.prim.shape[0]
    nee = settings.integrator == "pt-direct"
    ibl = settings.sky_kind == SKY_IBL
    bvh = scene.bvh
    k = bvh.blk_p0.shape[1]
    rpb = bvh.pk_blk.shape[0] // bvh.blk_p0.shape[0]
    rpm = bvh.pk_pm.shape[0] // bvh.blk_p0.shape[0]
    table_bytes = pallas_bvh.table_vmem_bytes(bvh)
    call = _make_call_bvh(
        ns, nm, nl, nee, settings.has_lights, settings.no_direct_emitter,
        settings.depth, settings.depth_limit, present, k, rpb, rpm, ibl,
        table_bytes, interpret,
    )
    _, st, mt, lt, misc = _pack_tables(scene, present)
    seed_i32 = jax.lax.bitcast_convert_type(
        rng_mod._seed_u32(seed), jnp.int32
    )

    def step(state):
        n = state.o.shape[0]
        pad = (-n) % PACKET
        tiles = _state_tiles(state, pad)
        outs = call(state.bounce, seed_i32, bvh.pk_nodes, bvh.pk_blk,
                    bvh.pk_pm, st, mt, mt, lt, misc, tuple(tiles))
        flat = [x.reshape(-1)[:n] for x in outs]
        o = jnp.stack(flat[0:3], axis=-1)
        d = jnp.stack(flat[3:6], axis=-1)
        thr = jnp.stack(flat[6:9], axis=-1)
        acc = jnp.stack(flat[9:12], axis=-1)
        alive = flat[12] != 0
        rays = state.rays_traced + jnp.sum(flat[13])
        if ibl:
            # Sky-on-miss epilogue: the kernel flags misses; the equirect
            # gather runs here (per-lane dynamic indexing).
            miss = flat[14]
            sky_l = sky_ops.radiance(scene.sky, settings.sky_kind, state.d)
            acc = acc + miss[..., None] * state.throughput * sky_l
        return PathState(
            bounce=state.bounce + 1,
            o=o, d=d, throughput=thr, accum=acc, alive=alive,
            rays_traced=rays, lane=state.lane,
        )

    return step


# ---------------------------------------------------------------------------
# Hand-written backward kernel (Lambert-only scenes)
#
# For Lambert scenes the bounce backward is analytically tiny, which XLA's
# autodiff cannot see through the where/select graph:
#   * the throughput weight is EXACTLY w = albedo * checker(pos):
#     cos/pdf = cos/(cos/pi) cancels, including its normal-gradient;
#   * the sampled direction carries no input gradients (ONB of a
#     piecewise-constant normal + RNG only);
#   * RR probability comes from the DETACHED table (sampling decision), so
#     no albedo gradient flows through it;
#   * all masks (front-face, RR accept, NEE visibility, checker texel) are
#     piecewise constant;
#   * dt/d(o,d) is the plane equation at the winner normal — for spheres
#     too (any smooth surface is first-order its tangent plane).
# What remains: the emission/sky/NEE accumulation products, the NEE
# geometry-term chain (incl. sphere-normal chains on both the main hit and
# the shadow hit — sphere lights), and the position/plane chain. One
# kernel pass computes all input cotangents plus per-row material/sky
# gradients, so the differentiable path needs NO rematerialized XLA bounce
# at all: residuals are just the (small) input PathState.
# ---------------------------------------------------------------------------


def supported_diff(scene, settings) -> bool:
    """Whether the hand-VJP fused bounce can serve the differentiable path:
    `supported` plus a Lambert-only material table (the closed-form
    backward above is derived for Lambert; other families keep the XLA
    autodiff path)."""
    if not supported(scene, settings):
        return False
    present = settings.mat_types
    if present is None or tuple(present) != (MAT_LAMBERT,):
        return False
    # Gradient-row layout in the bwd kernel: nm*8+3 entries must fit one
    # 128-lane row.
    if scene.materials.type_id.shape[0] > 15:
        return False
    return True


def enabled_diff(scene, settings) -> bool:
    flag = os.environ.get("LLR_FUSED", "auto")
    if flag == "0" or getattr(settings, "fused", "auto") == "off":
        return False
    force = flag == "1" or getattr(settings, "fused", "auto") == "on"
    if not (force or on_tpu()):
        return False
    return supported_diff(scene, settings)


def _norm_vjp(u3, n3, g3, scale):
    """VJP of n = normalize(u): gu = (g - n (n.g)) / |u| with |u| passed as
    `scale` (guarded)."""
    ndg = _dot(n3, g3)
    inv = 1.0 / jnp.maximum(scale, 1e-20)
    return ((g3[0] - n3[0] * ndg) * inv,
            (g3[1] - n3[1] * ndg) * inv,
            (g3[2] - n3[2] * ndg) * inv)


def _bounce_bwd_kernel(
    bounce_ref, seed_ref,
    tt_ref, st_ref, mts_ref, mte_ref, lt_ref, misc_ref,
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    tr_ref, tg_ref, tb_ref, alive_ref, lane_ref,
    gox_ref, goy_ref, goz_ref, gdx_ref, gdy_ref, gdz_ref,
    gtr_ref, gtg_ref, gtb_ref, gar_ref, gag_ref, gab_ref,
    # outputs
    obx_ref, oby_ref, obz_ref, dbx_ref, dby_ref, dbz_ref,
    tbx_ref, tby_ref, tbz_ref, gtab_ref,
    *, nt: int, ns: int, nm: int, nl: int, nee: bool, has_lights: bool,
    no_direct_emitter: bool, depth: int, depth_limit: int,
):
    o3 = (ox_ref[:], oy_ref[:], oz_ref[:])
    d3 = (dx_ref[:], dy_ref[:], dz_ref[:])
    T0 = (tr_ref[:], tg_ref[:], tb_ref[:])
    alive0 = alive_ref[:] != 0
    lane = lane_ref[:]
    bounce = bounce_ref[0, 0]
    seed = seed_ref[0, 0]
    ctr0 = bounce * _SLOTS
    go_p = (gox_ref[:], goy_ref[:], goz_ref[:])  # cotangent of o'
    gd_p = (gdx_ref[:], gdy_ref[:], gdz_ref[:])
    gT_p = (gtr_ref[:], gtg_ref[:], gtb_ref[:])
    gA = (gar_ref[:], gag_ref[:], gab_ref[:])  # accum is add-only: Abar_in = Abar'
    zero = jnp.zeros((SUB, LANE), jnp.float32)
    present = (MAT_LAMBERT,)

    # ---- primal recompute (mirrors _bounce_kernel, Lambert path) ----
    inf_t = jnp.full((SUB, LANE), INF, jnp.float32)
    t, hit, mat_f, n3, sc3, is_sph = _intersect_all(
        tt_ref, st_ref, o3, d3, inf_t, nt, ns
    )
    pos3, n3 = _shade_winner(o3, d3, t, hit, n3, sc3, is_sph, ns)
    missed = alive0 & ~hit
    alive1 = alive0 & hit
    # Detached-sampling split: RR prob / NEE emissive-early-out from the
    # SAMPLE table; all evaluated radiometry (and its gradients) from the
    # EVAL table.
    m_s = _gather_mat(mts_ref, mat_f, nm, present)
    m = _gather_mat(mte_ref, mat_f, nm, present)
    out3 = _neg(d3)
    sky3 = (misc_ref[0, 0], misc_ref[0, 1], misc_ref[0, 2])

    u_rr, r1, r2, r3u = _pcg4d_uniform4(lane, ctr0 + _SCATTER, seed)
    prob = jnp.maximum(jnp.maximum(m_s["col"][0], m_s["col"][1]), m_s["col"][2])
    over = jnp.maximum(bounce - depth_limit, 0).astype(jnp.float32)
    prob = prob * jnp.exp2(-over)
    prob = jnp.where((bounce <= depth) & (prob > 0.0), 1.0, prob)
    cont = (prob == 1.0) | (u_rr < prob)
    alive2 = alive1 & cont
    invp = 1.0 / jnp.maximum(prob, 1e-12)
    T1 = _scale(T0, invp)

    ck = _checker(pos3[0], pos3[2])
    # Forward weight: w_c = albedo_c * ck exactly (cos/pdf cancels);
    # lane-death needs the sampled pdf's zero-ness.
    sigma = jnp.where(_dot(n3, out3) < 0.0, -1.0, 1.0)
    on3 = _scale(n3, sigma)
    u3b, v3b = _onb(on3)
    phi = 2.0 * PI * r1
    cp, sp_ = jnp.cos(phi), jnp.sin(phi)
    r2s = jnp.sqrt(r2)
    d_lam = _add(
        _add(_scale(u3b, cp * r2s), _scale(v3b, sp_ * r2s)),
        _scale(on3, jnp.sqrt(1.0 - r2)),
    )
    pdf_s = _dot(d_lam, n3) / PI
    w3 = tuple(m["col"][c] * ck for c in range(3))
    w_nonzero = (w3[0] != 0.0) | (w3[1] != 0.0) | (w3[2] != 0.0)
    alive3 = alive2 & w_nonzero & (pdf_s != 0.0)

    # ---- cotangents ----
    a3f = alive3
    gpos = _where3(a3f, go_p, (zero, zero, zero))
    go_out = _where3(a3f, (zero, zero, zero), go_p)
    gd_out = _where3(a3f, (zero, zero, zero), gd_p)
    gT2 = _where3(a3f, gT_p, (zero, zero, zero))
    gT0 = _where3(a3f, (zero, zero, zero), gT_p)
    w_eff = tuple(jnp.where(alive2, w3[c], 1.0) for c in range(3))
    gT1 = tuple(gT2[c] * w_eff[c] for c in range(3))
    # albedo grad from the throughput weight (per channel, row = mat).
    a_bar = tuple(jnp.where(alive2, gT2[c] * T1[c] * ck, 0.0)
                  for c in range(3))
    e_bar = (zero, zero, zero)  # emission grad, row = mat
    en_bar = (zero, zero, zero)  # emission grad via NEE l_e, row = s_mat
    gn = (zero, zero, zero)  # cotangent of the (unit) main-hit normal
    s_mat = zero - 1.0

    if nee and has_lights:
        u_pick, u1, u2, _ = _pcg4d_uniform4(lane, ctr0 + _NEE, seed)
        total_area = misc_ref[0, 3]
        roulette = total_area * u_pick
        li = jnp.zeros((SUB, LANE), jnp.float32)
        for row in range(nl):
            li = li + jnp.where(lt_ref[row, 14] < roulette, 1.0, 0.0)
        li = jnp.clip(li, 0.0, float(nl - 1))
        l_is_tri = zero
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
        mn = jnp.minimum(u1, u2)
        mx = jnp.maximum(u1, u2)
        p_tri = _add(
            _add(_scale(lp0, mn), _scale(_add(lp0, le1), 1.0 - mx)),
            _scale(_add(lp0, le2), mx - mn),
        )
        phi_l = 2.0 * PI * u1
        z = u2 * 2.0 - 1.0
        zs = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        p_sph = _add(lc, _scale((jnp.cos(phi_l) * zs, jnp.sin(phi_l) * zs, z), lr))
        lpoint = _where3(l_is_tri > 0.0, p_tri, p_sph)

        path3 = _sub(lpoint, pos3)
        Q = _dot(path3, path3)
        dist = jnp.sqrt(jnp.maximum(Q, 0.0))
        D = jnp.maximum(dist, 1e-20)
        wi3 = _scale(path3, 1.0 / D)
        pn3 = on3  # orienting normal == sigma * n
        cos_p = _dot(wi3, pn3)
        ok = cos_p > 0.0
        ok = ok & (_dot(m_s["emi"], m_s["emi"]) <= 0.0)
        s_t, s_hit, s_mat, s_n3, s_sc3, s_sph = _intersect_all(
            tt_ref, st_ref, pos3, wi3, dist + 2.0 * EPS, nt, ns
        )
        s_pos3, s_n3 = _shade_winner(pos3, wi3, s_t, s_hit, s_n3, s_sc3,
                                     s_sph, ns)
        visible = s_hit & (jnp.abs(s_t - dist) <= EPS)
        ok = ok & visible
        lcos = _dot(_neg(wi3), s_n3)
        ok = ok & (lcos > 0.0)
        m_nee = alive2 & ok

        Qg = jnp.maximum(Q, 1e-20)
        g = cos_p * lcos / Qg
        f1 = tuple(m["col"][c] * ck / PI for c in range(3))
        sm = jnp.maximum(s_mat, 0.0)
        le3 = (zero, zero, zero)
        for row in range(nm):
            sel = sm == float(row)
            le3 = _where3(sel, (mte_ref[row, 4], mte_ref[row, 5], mte_ref[row, 6]), le3)
        gp = g * total_area  # g / pdf_L

        # accum contribution VJP
        contrib = tuple(f1[c] * le3[c] * gp for c in range(3))
        gT1 = tuple(
            gT1[c] + jnp.where(m_nee, gA[c] * contrib[c], 0.0)
            for c in range(3)
        )
        a_bar = tuple(
            a_bar[c]
            + jnp.where(m_nee, gA[c] * T1[c] * le3[c] * gp * ck / PI, 0.0)
            for c in range(3)
        )
        en_bar = tuple(
            jnp.where(m_nee, gA[c] * T1[c] * f1[c] * gp, 0.0)
            for c in range(3)
        )
        gg = jnp.where(
            m_nee,
            (gA[0] * T1[0] * f1[0] * le3[0]
             + gA[1] * T1[1] * f1[1] * le3[1]
             + gA[2] * T1[2] * f1[2] * le3[2]) * total_area,
            0.0,
        )
        # g = cos_p * lcos / Qg. Every cotangent is selected under m_nee:
        # on miss lanes pos is +INF and the NEE intermediates are NaN, so
        # the masked branch must never be the selected one.
        msel = lambda x: jnp.where(m_nee, x, 0.0)
        msel3 = lambda v: _where3(m_nee, v, (zero, zero, zero))
        gcos_p = msel(gg * lcos / Qg)
        glcos = msel(gg * cos_p / Qg)
        gQ = msel(jnp.where(Q > 1e-20, -gg * cos_p * lcos / (Qg * Qg), 0.0))
        gpath = msel3(_scale(path3, 2.0 * gQ))
        gwi = _scale(pn3, gcos_p)
        gn = _scale(wi3, gcos_p * sigma)  # via pn = sigma * n
        gwi = msel3(_sub(gwi, _scale(s_n3, glcos)))  # lcos = -wi . s_n
        gsn = msel3(_scale(wi3, -glcos))
        if ns:
            # Sphere shadow hit (sphere lights): s_n = normalize(s_pos - c),
            # s_pos = pos + wi s_t, ds_t implicit-plane =>
            # d s_pos = P (dpos + s_t dwi), P = I - wi s_n^T/(s_n.wi).
            mask_ss = m_nee & (s_sph > 0.5)
            us3 = _sub(s_pos3, s_sc3)
            nu = _norm(us3)
            gu = _norm_vjp(us3, s_n3, gsn, nu)
            gu = _where3(mask_ss, gu, (zero, zero, zero))
            den = _dot(s_n3, wi3)
            inv_den = jnp.where(jnp.abs(den) > 1e-12, 1.0 / den, 0.0)
            wdotgu = _dot(wi3, gu)
            ptgu = _where3(
                mask_ss, _sub(gu, _scale(s_n3, wdotgu * inv_den)),
                (zero, zero, zero),
            )
            gpos = _add(gpos, ptgu)
            gwi = _add(gwi, _scale(ptgu, s_t))
        # wi = path / D
        wdg = _dot(wi3, gwi)
        gpath = _add(
            gpath, msel3(_scale(_sub(gwi, _scale(wi3, wdg)), 1.0 / D))
        )
        gpos = _sub(gpos, gpath)  # path = lpoint - pos

    # Emission term (thr0 * e on front faces, depth gating).
    front = _dot(out3, n3) > 0.0
    emit_mask = None
    if nee:
        if not no_direct_emitter:
            emit_mask = alive1 & front & (bounce == 0)
    else:
        if no_direct_emitter:
            emit_mask = alive1 & front & (bounce != 0)
        else:
            emit_mask = alive1 & front
    if emit_mask is not None:
        gT0 = tuple(
            gT0[c] + jnp.where(emit_mask, gA[c] * m["emi"][c], 0.0)
            for c in range(3)
        )
        e_bar = tuple(jnp.where(emit_mask, gA[c] * T0[c], 0.0)
                      for c in range(3))

    # Sky term.
    gT0 = tuple(
        gT0[c] + jnp.where(missed, gA[c] * sky3[c], 0.0) for c in range(3)
    )
    sky_bar = tuple(jnp.where(missed, gA[c] * T0[c], 0.0) for c in range(3))

    # RR division (prob is DETACHED — no albedo grad through it).
    gT0 = tuple(gT0[c] + gT1[c] * invp for c in range(3))

    # Sampled-direction chain for sphere winners: d_lam is built on the
    # ONB of on = sigma*n, and a sphere's n depends on pos — so the output
    # d' cotangent flows d'_bar -> (u, v, on) -> n_bar -> pos_bar. (For
    # triangle winners n is constant and the chain vanishes; the cos/pdf
    # pair's OWN n-gradient cancels analytically — XLA evaluates the two
    # canceling terms numerically, which turns into 1/cos^2 noise at
    # grazing samples, and this kernel uses the exact zero instead.)
    if ns:
        gL = _where3(a3f, gd_p, (zero, zero, zero))
        sq1r = jnp.sqrt(1.0 - r2)
        gon = _scale(gL, sq1r)
        gu = _scale(gL, cp * r2s)
        gv = _scale(gL, sp_ * r2s)
        # v = on x u:  on_bar += u x v_bar ; u_bar += v_bar x on
        gon = _add(gon, _cross(u3b, gv))
        gu = _add(gu, _cross(gv, on3))
        # u = normalize(a x on), a piecewise-constant (EPS branch):
        use_y = jnp.abs(on3[0]) > EPS
        one = jnp.ones_like(zero)
        a3 = (jnp.where(use_y, zero, one), jnp.where(use_y, one, zero), zero)
        c3_ = _cross(a3, on3)
        gc = _norm_vjp(c3_, u3b, gu, _norm(c3_))
        gon = _add(gon, _cross(gc, a3))
        gn = _add(gn, _scale(gon, sigma))

    # Main-hit sphere normal chain (NEE pn + sampling ONB used n(pos)).
    if ns:
        mask_ms = is_sph > 0.5
        um3 = _sub(pos3, sc3)
        num = _norm(um3)
        gum = _norm_vjp(um3, n3, gn, num)
        gpos = _add(gpos, _where3(mask_ms, gum, (zero, zero, zero)))

    # pos = o + d t; plane-equation t chain at the winner normal. t is
    # +INF on miss lanes (whose gpos is zero) — clamp so 0 * INF never
    # NaN-poisons the cotangents.
    t_safe = jnp.where(hit, t, 0.0)
    go_out = _add(go_out, gpos)
    gd_out = _add(gd_out, _scale(gpos, t_safe))
    gt = _dot(gpos, d3)
    dn = _dot(d3, n3)
    safe = hit & (jnp.abs(dn) > 1e-20)
    ginv = jnp.where(safe, gt / jnp.where(safe, dn, 1.0), 0.0)
    go_out = _sub(go_out, _scale(n3, ginv))
    gd_out = _sub(gd_out, _scale(n3, ginv * t_safe))
    if ns:
        # Sphere winners: XLA differentiates t = -co.d - sqrt(det) AS
        # WRITTEN, a formula valid only for unit d, so its dt/dd carries an
        # extra RADIAL term vs the tangent-plane form:
        #   dt/dd = t co/sq = -t n/(n.d) + t^2 d/(r (n.d)).
        # The radial part is annihilated by the first normalize upstream
        # (the camera ray normalization), so final gradients are identical
        # either way — it is reproduced here for exact VJP parity with the
        # XLA step. (dt/do has no such term; the two forms coincide.)
        r_m = _norm(_sub(pos3, sc3))
        rad = jnp.where(
            safe & (is_sph > 0.5),
            ginv * t_safe * t_safe / jnp.maximum(r_m, 1e-20),
            0.0,
        )
        gd_out = _add(gd_out, _scale(d3, rad))

    obx_ref[:], oby_ref[:], obz_ref[:] = go_out
    dbx_ref[:], dby_ref[:], dbz_ref[:] = gd_out
    tbx_ref[:], tby_ref[:], tbz_ref[:] = gT0

    # Per-row material/sky gradients, reduced in-kernel to one 128-lane row
    # per grid step (entry r*8+c: albedo c | r*8+3+c: emission c; sky at
    # nm*8+c). Summed over grid steps by the caller.
    # (8, 128) cross-grid accumulator (Mosaic requires 8-divisible sublane
    # blocks; all grid steps map to the same output block, initialized at
    # step 0 — the sequential-grid accumulation pattern). Only row 0 is
    # populated; the caller sums over rows.
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 1)
    row0 = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0) == 0
    place = lambda k: row0 & (lane_id == k)
    row_out = jnp.zeros((8, LANE), jnp.float32)
    mm = jnp.maximum(mat_f, 0.0)
    for r in range(nm):
        sel_r = mm == float(r)
        for c in range(3):
            va = jnp.sum(jnp.where(sel_r, a_bar[c], 0.0))
            ve = jnp.sum(jnp.where(sel_r, e_bar[c], 0.0))
            if nee and has_lights:
                ve = ve + jnp.sum(
                    jnp.where(jnp.maximum(s_mat, 0.0) == float(r),
                              en_bar[c], 0.0)
                )
            row_out = row_out + jnp.where(place(r * 8 + c), va, 0.0)
            row_out = row_out + jnp.where(place(r * 8 + 3 + c), ve, 0.0)
    for c in range(3):
        row_out = row_out + jnp.where(
            place(nm * 8 + c), jnp.sum(sky_bar[c]), 0.0
        )

    @pl.when(pl.program_id(0) == 0)
    def _():
        gtab_ref[:] = row_out

    @pl.when(pl.program_id(0) != 0)
    def _():
        gtab_ref[:] = gtab_ref[:] + row_out


@functools.lru_cache(maxsize=None)
def _make_bwd_call(nt, ns, nm, nl, nee, has_lights, no_direct_emitter,
                   depth, depth_limit, interpret):
    kernel = functools.partial(
        _bounce_bwd_kernel, nt=nt, ns=ns, nm=nm, nl=nl, nee=nee,
        has_lights=has_lights, no_direct_emitter=no_direct_emitter,
        depth=depth, depth_limit=depth_limit,
    )

    def call(bounce, seed_i32, tt, st, mts, mte, lt, misc, tiles):
        rows = tiles[0].shape[0]
        grid = (rows // SUB,)
        smem = pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
        table = lambda a: pl.BlockSpec(
            a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        tile = pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        grow = pl.BlockSpec((8, LANE), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=(
                [jax.ShapeDtypeStruct((rows, LANE), jnp.float32)
                 for _ in range(9)]
                + [jax.ShapeDtypeStruct((8, LANE), jnp.float32)]
            ),
            in_specs=(
                [smem, smem]
                + [table(a) for a in (tt, st, mts, mte, lt, misc)]
                + [tile] * 23
            ),
            out_specs=[tile] * 9 + [grow],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            jnp.reshape(jnp.asarray(bounce, jnp.int32), (1, 1)),
            jnp.reshape(seed_i32, (1, 1)),
            tt, st, mts, mte, lt, misc, *tiles,
        )

    return call


def make_step_diff(scene, settings, seed, mats_eval, interpret: bool = False):
    """Differentiable bounce step: fused Pallas forward, hand-written
    Pallas backward (Lambert-only scenes; see `supported_diff`).

    A flat-signature jax.custom_vjp (every traced value an explicit array
    argument; pytree args broke jit(grad(scan)) lowering): the primal runs
    the fused forward kernel; the backward runs ONE kernel pass that
    recomputes the primal intermediates in VMEM and emits all input
    cotangents plus per-row material/sky gradients (accumulated across the
    sequential grid). Residuals are just the input state — no
    rematerialized XLA bounce exists anywhere on this path. Parameter
    gradients route through the ordinary table construction done in
    `step` (the custom bwd returns cotangents for the EVAL material table
    and the misc row; the SAMPLE table is detached by design).
    """
    import dataclasses as _dc

    from ..integrator.wavefront import PathState
    from ..scene.data import MaterialTable, SkyData
    from . import rng as rng_mod

    nt = scene.geometry.tri_p0.shape[0]
    ns = scene.geometry.sph_c.shape[0]
    nm = scene.materials.type_id.shape[0]
    nl = scene.lights.prim.shape[0]
    nee = settings.integrator == "pt-direct"
    fwd_call = _make_call(
        nt, ns, nm, nl, nee, settings.has_lights,
        settings.no_direct_emitter, settings.depth, settings.depth_limit,
        (MAT_LAMBERT,), interpret,
    )
    bwd_call = _make_bwd_call(
        nt, ns, nm, nl, nee, settings.has_lights,
        settings.no_direct_emitter, settings.depth, settings.depth_limit,
        interpret,
    )
    seed_i32 = jax.lax.bitcast_convert_type(
        rng_mod._seed_u32(seed), jnp.int32
    )

    # FLAT custom_vjp signature (mirrors ops/pallas_bvh.py's proven
    # structure): every traced value is an explicit jnp-array argument and
    # every output a flat tuple. Pytree-dataclass args/outputs here made
    # jit(grad(scan(...))) fail with "no constant handler for
    # DynamicJaxprTracer" during lowering; the flat form does not.
    # Gradients to the material/sky PARAMS route automatically through the
    # table construction (_mat_table / _pack_tables concatenates) done
    # outside the custom_vjp: the bwd returns a cotangent for the EVAL
    # material table (albedo cols 1:4, emission cols 4:7) and for the misc
    # row (sky color entries 0:3).

    def _tiles_of(o, d, thr, alive, lane, extra, pad):
        def prep(a, fill=0.0):
            if pad:
                a = jnp.concatenate(
                    [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], 0
                )
            return a

        to2d = lambda a: a.reshape(-1, LANE)
        return (
            [to2d(prep(o[:, c])) for c in range(3)]
            + [to2d(prep(d[:, c], 1.0)) for c in range(3)]
            + [to2d(prep(thr[:, c])) for c in range(3)]
            + extra
            + [to2d(prep(alive.astype(jnp.int32), 0))]
            + [to2d(prep(jax.lax.bitcast_convert_type(lane, jnp.int32), 0))]
        ), prep, to2d

    @jax.custom_vjp
    def f(o, d, thr, acc, alive, lane, bounce, sd, tt, st, mts, mte, lt,
          misc):
        n = o.shape[0]
        pad = (-n) % PACKET
        tiles, prep, to2d = _tiles_of(
            o, d, thr, alive, lane, [], pad
        )
        tiles = tiles[:9] + [to2d(prep(acc[:, c])) for c in range(3)] + tiles[9:]
        outs = fwd_call(bounce, sd, tt, st, mts, mte, lt, misc,
                        tuple(tiles))
        flat = [x.reshape(-1)[:n] for x in outs]
        return (
            jnp.stack(flat[0:3], axis=-1),  # o'
            jnp.stack(flat[3:6], axis=-1),  # d'
            jnp.stack(flat[6:9], axis=-1),  # thr'
            jnp.stack(flat[9:12], axis=-1),  # acc'
            flat[12] != 0,  # alive'
            jnp.sum(flat[13]),  # rays traced this bounce
        )

    def fwd(o, d, thr, acc, alive, lane, bounce, sd, tt, st, mts, mte, lt,
            misc):
        outs = f(o, d, thr, acc, alive, lane, bounce, sd, tt, st, mts, mte,
                 lt, misc)
        return outs, (o, d, thr, alive, lane, bounce, sd, tt, st, mts, mte,
                      lt, misc)

    def bwd(res, g):
        o, d, thr, alive, lane, bounce, sd, tt, st, mts, mte, lt, misc = res
        g_o, g_d, g_t, g_a, _, _ = g
        n = o.shape[0]
        pad = (-n) % PACKET
        tiles, prep, to2d = _tiles_of(o, d, thr, alive, lane, [], pad)
        tiles = tiles + (
            [to2d(prep(g_o[:, c])) for c in range(3)]
            + [to2d(prep(g_d[:, c])) for c in range(3)]
            + [to2d(prep(g_t[:, c])) for c in range(3)]
            + [to2d(prep(g_a[:, c])) for c in range(3)]
        )
        outs = bwd_call(bounce, sd, tt, st, mts, mte, lt, misc,
                        tuple(tiles))
        flat = [x.reshape(-1)[:n] for x in outs[:9]]
        ob = jnp.stack(flat[0:3], axis=-1)
        db = jnp.stack(flat[3:6], axis=-1)
        tb = jnp.stack(flat[6:9], axis=-1)
        gt = outs[9].sum(axis=0)  # (128,) accumulated row grads
        a_bar = jnp.stack(
            [gt[jnp.arange(nm) * 8 + c] for c in range(3)], axis=-1
        )
        e_bar = jnp.stack(
            [gt[jnp.arange(nm) * 8 + 3 + c] for c in range(3)], axis=-1
        )
        mte_bar = jnp.zeros_like(mte)
        mte_bar = mte_bar.at[:, 1:4].set(a_bar).at[:, 4:7].set(e_bar)
        misc_bar = jnp.zeros_like(misc).at[0, 0:3].set(
            gt[nm * 8: nm * 8 + 3]
        )

        import numpy as _np

        f0 = lambda x: _np.zeros(_np.shape(x), jax.dtypes.float0)
        return (
            ob, db, tb, g_a,
            f0(alive), f0(lane), f0(bounce), f0(sd),
            jnp.zeros_like(tt), jnp.zeros_like(st),
            jnp.zeros_like(mts),  # sample table: detached by design
            mte_bar, jnp.zeros_like(lt), misc_bar,
        )

    f.defvjp(fwd, bwd)

    def step(state: PathState) -> PathState:
        # Tables are built OUTSIDE the custom_vjp from the live params, so
        # parameter gradients flow through the (ordinary, differentiable)
        # table construction; the sample table comes from the scene's
        # detached copy.
        sc = _dc.replace(scene)
        tt, st, mt_s, lt, misc = _pack_tables(sc, (MAT_LAMBERT,))
        mt_e = _mat_table(mats_eval)
        o, d, thr, acc, alive, rays = f(
            state.o, state.d, state.throughput, state.accum, state.alive,
            state.lane, state.bounce, seed_i32, tt, st, mt_s, mt_e, lt,
            misc,
        )
        return PathState(
            bounce=state.bounce + 1,
            o=o, d=d, throughput=thr, accum=acc, alive=alive,
            rays_traced=state.rays_traced + rays, lane=state.lane,
        )

    step.fused_diff = True
    return step


# ---------------------------------------------------------------------------
# Hybrid differentiable step: fused Pallas FORWARD for every material
# family, structured-XLA BACKWARD (round-4 verdict item 1's fallback
# branch). The fused forward kernel already evaluates all five BSDFs; only
# the hand-derived backward is Lambert-only. For Phong/Blinn/GGX/
# refraction scenes this custom_vjp runs the fused kernel in the scan's
# forward sweep and, in the backward sweep, rebuilds the XLA bounce step
# from the SAME tables (same RNG counters -> same sampling decisions, up
# to the documented discontinuity flips) and applies jax.vjp to it — the
# one XLA recompute per bounce that bwd_remat="full" pays anyway, but with
# the cheap fused forward replacing the expensive XLA forward sweep.
# ---------------------------------------------------------------------------


def supported_diff_hybrid(scene, settings) -> bool:
    if not supported(scene, settings):
        return False
    if supported_diff(scene, settings):
        return False  # Lambert scenes: the hand-VJP path is strictly better
    return True


def enabled_diff_hybrid(scene, settings) -> bool:
    flag = os.environ.get("LLR_FUSED", "auto")
    if flag == "0" or getattr(settings, "fused", "auto") == "off":
        return False
    force = flag == "1" or getattr(settings, "fused", "auto") == "on"
    if not (force or on_tpu()):
        return False
    return supported_diff_hybrid(scene, settings)


def make_step_diff_hybrid(scene, settings, seed, mats_eval,
                          interpret: bool = False):
    """Differentiable bounce step: fused Pallas forward (all five material
    families), XLA-vjp backward reconstructed from the flat tables.

    Flat custom_vjp signature like `make_step_diff` (pytree args broke
    jit(grad(scan)) lowering). The backward rebuilds Geometry / LightTable
    / MaterialTable / SkyData FROM THE TABLE ARGUMENTS (tt/st/mts/mte/lt/
    misc carry everything the brute-regime XLA step reads), so nothing
    traced is closed over."""
    import dataclasses as _dc

    from ..integrator import wavefront as _wf
    from ..integrator.wavefront import PathState
    from ..scene.data import (
        Bvh,
        CameraData,
        Geometry,
        LightTable,
        MaterialTable,
        SceneData,
        SkyData,
    )
    from . import rng as rng_mod

    nt = scene.geometry.tri_p0.shape[0]
    ns = scene.geometry.sph_c.shape[0]
    nm = scene.materials.type_id.shape[0]
    nl = scene.lights.prim.shape[0]
    nee = settings.integrator == "pt-direct"
    present = settings.mat_types
    present = _ALL_TYPES if present is None else tuple(present)
    fwd_call = _make_call(
        nt, ns, nm, nl, nee, settings.has_lights,
        settings.no_direct_emitter, settings.depth, settings.depth_limit,
        present, interpret,
    )
    seed_i32 = jax.lax.bitcast_convert_type(
        rng_mod._seed_u32(seed), jnp.int32
    )
    f32 = jnp.float32

    def _mat_from(table):
        return MaterialTable(
            type_id=table[:, 0].astype(jnp.int32),
            color=table[:, 1:4],
            emission=table[:, 4:7],
            alpha=table[:, 7],
            ior=table[:, 8],
            absorbtance=table[:, 9],
        )

    def _scene_from(tt, st, mts, lt, misc):
        zero3 = jnp.zeros((0, 3), f32)
        zero1 = jnp.zeros((0,), f32)
        geom = Geometry(
            tri_p0=tt[:, 0:3] if nt else zero3,
            tri_e1=tt[:, 3:6] if nt else zero3,
            tri_e2=tt[:, 6:9] if nt else zero3,
            tri_n=tt[:, 9:12] if nt else zero3,
            tri_mat=(tt[:, 12].astype(jnp.int32) if nt
                     else jnp.zeros((0,), jnp.int32)),
            sph_c=st[:, 0:3] if ns else zero3,
            sph_r=st[:, 3] if ns else zero1,
            sph_mat=(st[:, 4].astype(jnp.int32) if ns
                     else jnp.zeros((0,), jnp.int32)),
        )
        lights = LightTable(
            prim=jnp.zeros((nl,), jnp.int32),  # unused by sampling
            area=lt[:, 13] * 0.0,  # unused (pdf = 1/total_area)
            cdf=lt[:, 14],
            total_area=misc[0, 3],
            is_tri=lt[:, 0].astype(jnp.int32),
            p0=lt[:, 1:4],
            e1=lt[:, 4:7],
            e2=lt[:, 7:10],
            c=lt[:, 10:13],
            r=lt[:, 13],
        )
        sky = SkyData(
            color=misc[0, 0:3],
            color2=jnp.zeros((3,), f32),
            ibl=jnp.ones((1, 2, 3), f32),
            longitude_offset=jnp.float32(0.0),
        )
        i3 = jnp.zeros((1,), jnp.int32)
        bvh = Bvh(  # never traversed: supported() => brute regime
            node_min=jnp.zeros((1, 3), f32), node_max=jnp.zeros((1, 3), f32),
            node_miss=i3 - 1, node_leaf=i3 - 1,
            blk_p0=jnp.zeros((1, 4, 3), f32),
            blk_e1=jnp.zeros((1, 4, 3), f32),
            blk_e2=jnp.zeros((1, 4, 3), f32),
            blk_n=jnp.zeros((1, 4, 3), f32),
            blk_prim=jnp.zeros((1, 4), jnp.int32) - 1,
            blk_mat=jnp.zeros((1, 4), jnp.int32) - 1,
            pk_nodes=jnp.zeros((1, 8), f32),
            pk_blk=jnp.zeros((1, LANE), f32),
            pk_pm=jnp.zeros((1, LANE), jnp.int32),
        )
        cam = CameraData(
            position=jnp.zeros((3,), f32),
            aperture_position=jnp.zeros((3,), f32),
            forward=jnp.zeros((3,), f32), right=jnp.zeros((3,), f32),
            up=jnp.zeros((3,), f32), sensor_size=jnp.ones((2,), f32),
            aperture_radius=jnp.float32(1.0),
            focus_distance=jnp.float32(1.0),
            aperture_sensor_distance=jnp.float32(1.0),
            sensor_sensitivity=jnp.float32(1.0),
        )
        return SceneData(geometry=geom, materials=_mat_from(mts),
                         lights=lights, bvh=bvh, sky=sky, camera=cam)

    def _tiles_of(o, d, thr, acc, alive, lane, pad):
        def prep(a, fill=0.0):
            if pad:
                a = jnp.concatenate(
                    [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], 0
                )
            return a

        to2d = lambda a: a.reshape(-1, LANE)
        return (
            [to2d(prep(o[:, c])) for c in range(3)]
            + [to2d(prep(d[:, c], 1.0)) for c in range(3)]
            + [to2d(prep(thr[:, c])) for c in range(3)]
            + [to2d(prep(acc[:, c])) for c in range(3)]
            + [to2d(prep(alive.astype(jnp.int32), 0))]
            + [to2d(prep(jax.lax.bitcast_convert_type(lane, jnp.int32),
                         0))]
        )

    @jax.custom_vjp
    def f(o, d, thr, acc, alive, lane, bounce, sd, tt, st, mts, mte, lt,
          misc):
        n = o.shape[0]
        pad = (-n) % PACKET
        tiles = _tiles_of(o, d, thr, acc, alive, lane, pad)
        outs = fwd_call(bounce, sd, tt, st, mts, mte, lt, misc,
                        tuple(tiles))
        flat = [x.reshape(-1)[:n] for x in outs]
        return (
            jnp.stack(flat[0:3], axis=-1),
            jnp.stack(flat[3:6], axis=-1),
            jnp.stack(flat[6:9], axis=-1),
            jnp.stack(flat[9:12], axis=-1),
            flat[12] != 0,
            jnp.sum(flat[13]),
        )

    def fwd(o, d, thr, acc, alive, lane, bounce, sd, tt, st, mts, mte, lt,
            misc):
        outs = f(o, d, thr, acc, alive, lane, bounce, sd, tt, st, mts,
                 mte, lt, misc)
        return outs, (o, d, thr, acc, alive, lane, bounce, tt, st, mts,
                      mte, lt, misc)

    def bwd(res, g):
        (o, d, thr, acc, alive, lane, bounce, tt, st, mts, mte, lt,
         misc) = res
        g_o, g_d, g_t, g_a, _, _ = g

        def prim(o_, d_, thr_, acc_, mte_, misc_):
            scene_r = _scene_from(tt, st, mts, lt, misc_)
            step = _wf.make_bounce_step(
                scene_r, settings, seed, mats_eval=_mat_from(mte_),
                allow_fused=False,
            )
            st2 = step(PathState(
                bounce=bounce, o=o_, d=d_, throughput=thr_, accum=acc_,
                alive=alive, rays_traced=jnp.float32(0.0), lane=lane,
            ))
            return st2.o, st2.d, st2.throughput, st2.accum

        _, vjp = jax.vjp(prim, o, d, thr, acc, mte, misc)
        ob, db, tb, ab, mte_bar, misc_bar = vjp((g_o, g_d, g_t, g_a))

        import numpy as _np

        f0 = lambda x: _np.zeros(_np.shape(x), jax.dtypes.float0)
        return (
            ob, db, tb, ab,
            f0(alive), f0(lane), f0(bounce), f0(jnp.int32(0)),
            jnp.zeros_like(tt), jnp.zeros_like(st),
            jnp.zeros_like(mts),  # sample table: detached by design
            mte_bar, jnp.zeros_like(lt), misc_bar,
        )

    f.defvjp(fwd, bwd)

    def step(state: PathState) -> PathState:
        sc = _dc.replace(scene)
        tt, st, mt_s, lt, misc = _pack_tables(sc, present)
        mt_e = _mat_table(mats_eval)
        o, d, thr, acc, alive, rays = f(
            state.o, state.d, state.throughput, state.accum, state.alive,
            state.lane, state.bounce, seed_i32, tt, st, mt_s, mt_e, lt,
            misc,
        )
        return PathState(
            bounce=state.bounce + 1,
            o=o, d=d, throughput=thr, accum=acc, alive=alive,
            rays_traced=state.rays_traced + rays, lane=state.lane,
        )

    step.fused_diff = True
    return step


# ---------------------------------------------------------------------------
# Fused camera ray generation (ideal pinhole, tiled power-of-two films)
#
# The last XLA stage of the fused forward path: per-chunk ray-gen (pixel
# decode + pcg4d jitter + sensor math) measured ~4 ms at 2M lanes. This
# kernel generates (o, d) tiles directly from the grid position — no lane
# arrays are even read — with bit-identical RNG and identical camera math
# to ops/camera.py:sample_rays (ideal pinhole: pdf = g = 1, quirk #11).
# Gated to power-of-two film dims and tile sizes so every pixel decode is
# shifts-and-masks (Mosaic has no fast vector integer division).
# ---------------------------------------------------------------------------


def _log2i(x: int) -> int:
    return x.bit_length() - 1


def raygen_supported(settings) -> bool:
    from ..scene.data import (
        CAM_IDEAL_PINHOLE,
        CAM_PINHOLE,
        CAM_THIN_LENS,
    )

    if getattr(settings, "fused", "auto") == "off":
        return False
    if os.environ.get("LLR_FUSED", "auto") == "0":
        return False
    # Every camera but the basis-free omnidirectional (`camera.rs:169-188`):
    # pinhole, thin-lens and the realistic pinhole share the sensor /
    # aperture sampling math (`camera.rs:64-81,285-300,411-445`).
    if settings.camera_kind not in (
        CAM_IDEAL_PINHOLE, CAM_THIN_LENS, CAM_PINHOLE
    ):
        return False
    # Any film geometry: pow2 films use the mask decode, everything else
    # (tiled non-pow2 dims, raster tiny films) the general
    # constant-divisor decode.
    return True


def _raygen_kernel(sc_ref, cam_ref, *out_refs, w: int, h: int, tw: int,
                   th: int, kind: int):
    from ..scene.data import CAM_IDEAL_PINHOLE, CAM_PINHOLE

    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref = out_refs[:6]
    seed = sc_ref[0, 0]  # int32 bit-pattern
    sample_off = sc_ref[0, 1]
    i = pl.program_id(0)
    base = i * PACKET
    lane_local = (
        base
        + jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 0) * LANE
        + jax.lax.broadcasted_iota(jnp.int32, (SUB, LANE), 1)
    )
    glane = lane_local + sample_off * (w * h)  # wraps like uint32

    wh = w * h

    def _mod(x, m: int):
        # int32 x % m for a compile-time constant m >= 1 (x >= 0):
        # power-of-two m lowers to a mask, otherwise div-mul-sub.
        if m & (m - 1) == 0:
            return x & jnp.int32(m - 1)
        return x - (x // m) * m

    def _div(x, m: int):
        if m & (m - 1) == 0:
            return x >> _log2i(m)
        return x // m

    if tw == 0:
        # Raster decode (non-pow2 films without a tile order):
        # px = pixel % w, py = pixel // w.
        pixel = _mod(lane_local, wh)
        py = _div(pixel, w)
        px = pixel - py * w
    else:
        # Tile decode (integrator/render.py:tile_decode). tw*th is always
        # a power of two; w/h (and so tiles-per-row) may not be — those
        # steps use the general constant-divisor path.
        pixel = _mod(lane_local, wh)
        tile = _div(pixel, tw * th)
        within = _mod(pixel, tw * th)
        tpr = w // tw  # tiles per row
        px = _mod(tile, tpr) * tw + _mod(within, tw)
        py = _div(tile, tpr) * th + _div(within, tw)

    u, v, u2, v2 = _pcg4d_uniform4(glane, jnp.int32(0x40000000), seed)

    # Shared sensor sampling (ops/camera.py:sample_rays, camera.rs:64-81).
    sw0, sh0 = cam_ref[0, 9], cam_ref[0, 10]
    sx = ((px.astype(jnp.float32) + u) / w - 0.5) * sw0
    sy = ((py.astype(jnp.float32) + v) / h - 0.5) * sh0
    pos = (cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2])
    ap = (cam_ref[0, 3], cam_ref[0, 4], cam_ref[0, 5])
    right = (cam_ref[0, 6], cam_ref[0, 7], cam_ref[0, 8])
    up = (cam_ref[0, 11], cam_ref[0, 12], cam_ref[0, 13])
    sp3 = (
        pos[0] - right[0] * sx + up[0] * sy,
        pos[1] - right[1] * sx + up[1] * sy,
        pos[2] - right[2] * sx + up[2] * sy,
    )
    if kind == CAM_IDEAL_PINHOLE:
        ddx, ddy, ddz = ap[0] - sp3[0], ap[1] - sp3[1], ap[2] - sp3[2]
        # Divide (not reciprocal-multiply): matches vec.normalize
        # bit-for-bit, so films are identical to the XLA ray-gen path
        # rather than merely close (a last-ulp d difference seeds chaotic
        # per-lane divergence over 80 bounces).
        nrm = jnp.sqrt(jnp.maximum(ddx * ddx + ddy * ddy + ddz * ddz, 0.0))
        ox_ref[:] = jnp.full((SUB, LANE), 0.0) + ap[0]
        oy_ref[:] = jnp.full((SUB, LANE), 0.0) + ap[1]
        oz_ref[:] = jnp.full((SUB, LANE), 0.0) + ap[2]
        dx_ref[:] = ddx / nrm
        dy_ref[:] = ddy / nrm
        dz_ref[:] = ddz / nrm
        return

    # Finite-aperture kinds (`camera.rs:285-300,430-445`): disk sample on
    # the aperture, per-lane geometry term output.
    g_ref = out_refs[6]
    fwd = (cam_ref[0, 14], cam_ref[0, 15], cam_ref[0, 16])
    arad = cam_ref[0, 17]
    focus = cam_ref[0, 18]
    asd = cam_ref[0, 19]
    theta = 2.0 * PI * u2
    rad = jnp.sqrt(v2) * arad
    apx = ap[0] + right[0] * (jnp.cos(theta) * rad) + up[0] * (
        jnp.sin(theta) * rad
    )
    apy = ap[1] + right[1] * (jnp.cos(theta) * rad) + up[1] * (
        jnp.sin(theta) * rad
    )
    apz = ap[2] + right[2] * (jnp.cos(theta) * rad) + up[2] * (
        jnp.sin(theta) * rad
    )
    d0 = (apx - sp3[0], apy - sp3[1], apz - sp3[2])
    n0 = jnp.sqrt(jnp.maximum(_dot(d0, d0), 0.0))
    d0 = (d0[0] / n0, d0[1] / n0, d0[2] / n0)
    cos = _dot(d0, fwd)
    dist = asd / cos
    g_ref[:] = cos * cos / (dist * dist)
    ox_ref[:] = jnp.full((SUB, LANE), 0.0) + apx
    oy_ref[:] = jnp.full((SUB, LANE), 0.0) + apy
    oz_ref[:] = jnp.full((SUB, LANE), 0.0) + apz
    if kind == CAM_PINHOLE:
        # Realistic pinhole (`camera.rs:312-328`): straight through.
        dx_ref[:], dy_ref[:], dz_ref[:] = d0
        return
    # Thin lens (`camera.rs:458-476`): aim at the focus-plane projection of
    # the sensor->aperture-center ray.
    sc3 = (ap[0] - sp3[0], ap[1] - sp3[1], ap[2] - sp3[2])
    scale = focus / _dot(sc3, fwd)
    dd = (
        ap[0] + sc3[0] * scale - apx,
        ap[1] + sc3[1] * scale - apy,
        ap[2] + sc3[2] * scale - apz,
    )
    nn = jnp.sqrt(jnp.maximum(_dot(dd, dd), 0.0))
    dx_ref[:] = dd[0] / nn
    dy_ref[:] = dd[1] / nn
    dz_ref[:] = dd[2] / nn


@functools.lru_cache(maxsize=None)
def _make_raygen_call(w, h, tw, th, kind, interpret):
    from ..scene.data import CAM_IDEAL_PINHOLE

    kernel = functools.partial(_raygen_kernel, w=w, h=h, tw=tw, th=th,
                               kind=kind)
    n_out = 6 if kind == CAM_IDEAL_PINHOLE else 7

    def call(n_lanes, seed_i32, sample_off, cam_row):
        rows = n_lanes // LANE
        grid = (rows // SUB,)
        smem = pl.BlockSpec((1, 2), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
        table = pl.BlockSpec(cam_row.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        tile = pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        sc = jnp.stack(
            [seed_i32, jnp.asarray(sample_off, jnp.int32)]
        ).reshape(1, 2)
        return pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=[jax.ShapeDtypeStruct((rows, LANE), jnp.float32)
                       for _ in range(n_out)],
            in_specs=[smem, table],
            out_specs=[tile] * n_out,
            interpret=interpret,
        )(sc, cam_row)

    return call


def generate_rays(scene, settings, seed, sample_offset, n_lanes,
                  interpret: bool = False):
    """(o, d, g) for `n_lanes` camera lanes — Pallas ray generation.

    Drop-in for the XLA ray-gen in integrator/render.py when
    `raygen_supported(settings)`: every camera but omnidirectional
    (ideal pinhole / thin-lens / realistic pinhole, `camera.rs:100-119,
    285-337,411-476`), tiled pow2 films AND raster non-pow2 films.
    Bit-identical RNG, identical math, so films match the XLA path exactly
    (gated in tests). `g` is the per-lane geometry term (None for ideal
    pinhole where g=1); the constant pdf stays with the caller."""
    from . import rng as rng_mod
    from ..scene.data import CAM_IDEAL_PINHOLE

    cam = scene.camera
    f32 = jnp.float32
    cam_row = jnp.concatenate([
        cam.position.astype(f32), cam.aperture_position.astype(f32),
        cam.right.astype(f32), cam.sensor_size.astype(f32)[:2],
        cam.up.astype(f32), cam.forward.astype(f32),
        cam.aperture_radius.astype(f32).reshape(1),
        cam.focus_distance.astype(f32).reshape(1),
        cam.aperture_sensor_distance.astype(f32).reshape(1),
        jnp.zeros((4,), f32),
    ]).reshape(1, 24)
    seed_i32 = jax.lax.bitcast_convert_type(
        rng_mod._seed_u32(seed), jnp.int32
    )
    from ..integrator.render import _pow2_tile, tile_decode

    if tile_decode(settings) is None:
        tw = th = 0  # raster decode
    else:
        tw, th = _pow2_tile(settings.width), _pow2_tile(settings.height)
    assert n_lanes % PACKET == 0
    call = _make_raygen_call(settings.width, settings.height, tw, th,
                             settings.camera_kind, interpret)
    outs = call(n_lanes, seed_i32, sample_offset, cam_row)
    flat = [x.reshape(-1) for x in outs]
    o = jnp.stack(flat[0:3], axis=-1)
    d = jnp.stack(flat[3:6], axis=-1)
    g = flat[6] if settings.camera_kind != CAM_IDEAL_PINHOLE else None
    return o, d, g
