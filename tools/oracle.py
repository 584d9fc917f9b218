"""Independent scalar oracle: a deliberately naive numpy port of the
reference estimator, for full-image statistical cross-checks.

This is NOT part of the renderer. It re-implements the reference's
recursive Monte Carlo estimator line by line — `radiance` /
`radiance_nee` (`/root/reference/src/scene.rs:20-46,64-193`), the
per-pixel sample loop (`/root/reference/src/main.rs:92-121`), all five
materials (`/root/reference/src/material/*.rs`), sphere/triangle
intersection (`/root/reference/src/sphere.rs:42-63`,
`/root/reference/src/triangle.rs:69-100`), NEE light sampling
(`/root/reference/src/objects.rs:37-51`), and the camera models
(`/root/reference/src/camera.rs`) — in scalar Python/numpy with its OWN
RNG (python stdlib Mersenne Twister) and float64 arithmetic.

Because every algorithmic decision is made independently here (per-ray
recursion, brute-force nearest-hit, python RNG, double precision), a
per-pixel statistical match between this oracle and the wavefront TPU
renderer is a real cross-implementation test of the whole estimator, not
a self-golden. The only shared input is the compiled scene's numpy data
(geometry/material/light tables and the camera frame) — scene *compilation*
is cross-checked separately (tests/test_transform.py, test_loader.py,
test_bvh.py); this module cross-checks everything downstream of it.

Intersection is brute force over all primitives (the reference's own
commented-out brute path, `objects.rs:67-73`, which its BVH must agree
with); vectorized over prims with numpy for speed, but one ray at a time.
"""

from __future__ import annotations

import math
import random
import sys

import numpy as np

PI = math.pi
EPS = 1e-3  # constant.rs:2


def _np(x):
    return np.asarray(x, dtype=np.float64)


class OracleScene:
    """Host-side numpy snapshot of a CompiledScene + its RenderSettings."""

    def __init__(self, compiled):
        d = compiled.data
        g = d.geometry
        self.tri_p0 = _np(g.tri_p0)
        self.tri_e1 = _np(g.tri_e1)
        self.tri_e2 = _np(g.tri_e2)
        self.tri_mat = np.asarray(g.tri_mat, dtype=np.int64)
        # Face normal recomputed independently: (p1-p0) x (p2-p0),
        # normalized (triangle.rs:36-37).
        n = np.cross(self.tri_e1, self.tri_e2)
        self.tri_n = n / np.maximum(
            np.linalg.norm(n, axis=-1, keepdims=True), 1e-300
        )
        self.sph_c = _np(g.sph_c)
        self.sph_r = _np(g.sph_r)
        self.sph_mat = np.asarray(g.sph_mat, dtype=np.int64)

        m = d.materials
        self.mat_type = np.asarray(m.type_id, dtype=np.int64)
        self.mat_color = _np(m.color)
        self.mat_emission = _np(m.emission)
        self.mat_alpha = _np(m.alpha)
        self.mat_ior = _np(m.ior)
        self.mat_absorb = _np(m.absorbtance)

        lt = d.lights
        self.light_prim = np.asarray(lt.prim, dtype=np.int64)
        self.light_area = _np(lt.area)
        self.light_is_tri = np.asarray(lt.is_tri, dtype=np.int64)
        self.light_p0 = _np(lt.p0)
        self.light_e1 = _np(lt.e1)
        self.light_e2 = _np(lt.e2)
        self.light_c = _np(lt.c)
        self.light_r = _np(lt.r)
        self.emission_area = float(np.sum(self.light_area))

        s = d.sky
        self.sky_color = _np(s.color)
        self.sky_color2 = _np(s.color2)
        self.sky_ibl = _np(s.ibl)
        self.sky_lon = float(s.longitude_offset)

        c = d.camera
        self.cam_position = _np(c.position)
        self.cam_aperture = _np(c.aperture_position)
        self.cam_forward = _np(c.forward)
        self.cam_right = _np(c.right)
        self.cam_up = _np(c.up)
        self.cam_sensor_size = _np(c.sensor_size)
        self.cam_aperture_radius = float(c.aperture_radius)
        self.cam_focus_distance = float(c.focus_distance)
        self.cam_asd = float(c.aperture_sensor_distance)
        self.cam_sensitivity = float(c.sensor_sensitivity)

        st = compiled.settings
        self.width = st.width
        self.height = st.height
        self.spp = st.spp
        self.depth = st.depth
        self.depth_limit = st.depth_limit
        self.no_direct_emitter = st.no_direct_emitter
        self.integrator = st.integrator
        self.camera_kind = st.camera_kind
        self.sky_kind = st.sky_kind

        if self.camera_kind == 3:
            raise NotImplementedError(
                "oracle: realistic-pinhole camera (reference-unreachable, "
                "camera.rs:199-337) is not cross-checked"
            )

        self._rng = random.Random(0)

    # ---------------------------------------------------------------- RNG
    def rand(self) -> float:
        """rand::random::<f32>() stand-in — own stream, own algorithm."""
        return self._rng.random()

    # --------------------------------------------------------- intersection
    def intersect(self, o, d):
        """Nearest hit over ALL primitives (brute force, objects.rs:67-73).

        Returns (t, position, normal, material_row) or None.
        Triangle: Moeller-Trumbore with the reference's fat tolerances
        (|det| < EPS and t < EPS rejects, triangle.rs:69-100). Sphere:
        asymmetric-EPS quadratic (sphere.rs:42-63).
        """
        best_t = math.inf
        best = None
        if self.tri_p0.shape[0]:
            e1, e2 = self.tri_e1, self.tri_e2
            pv = np.cross(np.broadcast_to(d, e2.shape), e2)
            det = np.einsum("ij,ij->i", e1, pv)
            with np.errstate(divide="ignore", invalid="ignore"):
                invdet = 1.0 / det
                tv = o - self.tri_p0
                u = np.einsum("ij,ij->i", tv, pv) * invdet
                qv = np.cross(tv, e1)
                v = (qv @ d) * invdet
                t = np.einsum("ij,ij->i", e2, qv) * invdet
            ok = (
                (np.abs(det) >= EPS)
                & (u >= 0.0)
                & (u <= 1.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t >= EPS)
            )
            if ok.any():
                ti = np.where(ok, t, math.inf)
                i = int(np.argmin(ti))
                best_t = float(ti[i])
                best = (
                    best_t,
                    self._pos32(o, d, best_t),
                    self.tri_n[i],
                    int(self.tri_mat[i]),
                )
        if self.sph_c.shape[0]:
            # FLOAT32 quadratic, like the reference (`sphere.rs:42-56`,
            # f32 throughout): det = cod^2 - |co|^2 + r^2 cancels ~1e10
            # against ~1e10 at cbox scale, so f32 rounding perturbs t by
            # whole UNITS at silhouettes — real, reference-faithful hit/
            # miss statistics a f64 oracle would get systematically
            # "righter" than the program under test (see _f32).
            f32 = np.float32
            co = (o.astype(f32) - self.sph_c.astype(f32))
            d32 = d.astype(f32)
            cod = (co @ d32).astype(f32)
            det = (
                cod * cod
                - np.einsum("ij,ij->i", co, co).astype(f32)
                + (self.sph_r.astype(f32)) ** 2
            ).astype(f32)
            with np.errstate(invalid="ignore"):
                sq = np.sqrt(np.maximum(det, f32(0.0))).astype(f32)
            t1 = (-cod - sq).astype(f32)
            t2 = (-cod + sq).astype(f32)
            ok = (det > 0.0) & ~((t1 < EPS) & (t2 < EPS))
            t = np.where(t1 > EPS, t1, t2).astype(np.float64)
            ok &= t < best_t
            if ok.any():
                ti = np.where(ok, t, math.inf)
                i = int(np.argmin(ti))
                tt = float(ti[i])
                p = self._pos32(o, d, tt)
                n = p - self.sph_c[i]
                n = n / np.linalg.norm(n)
                best = (tt, p, n, int(self.sph_mat[i]))
        return best

    @staticmethod
    def _pos32(o, d, t):
        """Hit position with FLOAT32 arithmetic (o + d * t in f32).

        The reference computes positions in f32 (`sphere.rs:55`,
        `triangle.rs:92`), leaving them ~2-3 ulp (~1e-4 at cbox scale) off
        the true surface; against EPS=1e-3 and curved geometry that error
        drives real self-intersection statistics (see _f32). Computing the
        position at storage precision keeps the oracle's self-shadowing
        rate comparable."""
        o32 = np.asarray(o, np.float32)
        d32 = np.asarray(d, np.float32)
        return (o32 + d32 * np.float32(t)).astype(np.float64)

    # ------------------------------------------------------------------ sky
    def sky_radiance(self, d):
        if self.sky_kind == 1:  # IBL (sky.rs:57-79)
            theta = math.acos(max(-1.0, min(1.0, d[1])))
            phi = math.atan2(d[2], d[0])
            u = ((phi + PI + self.sky_lon) / (2.0 * PI)) % 1.0
            v = (theta / PI) % 1.0
            h = self.sky_ibl.shape[0]
            w = 2 * h
            x = int(math.floor(w * u))
            y = int(math.floor(h * v))
            idx = (y * w + x) % (w * h)
            return self.sky_ibl.reshape(-1, 3)[idx]
        if self.sky_kind == 2:  # SimpleSky (sky.rs:28-33)
            wgt = abs(d[1])
            return self.sky_color * wgt + self.sky_color2 * (1.0 - wgt)
        return self.sky_color  # uniform (sky.rs:18-21)

    # ------------------------------------------------------------ materials
    @staticmethod
    def orienting_normal(out, n):
        return -n if float(n @ out) < 0.0 else n

    @staticmethod
    def onb(w):
        """OrthonormalBasis (util.rs:10-22): EPS branch on |w.x|."""
        a = (
            np.array([0.0, 1.0, 0.0])
            if abs(w[0]) > EPS
            else np.array([1.0, 0.0, 0.0])
        )
        t = np.cross(a, w)
        t = t / np.linalg.norm(t)
        b = np.cross(w, t)
        return t, b

    @staticmethod
    def reflect(v, n):
        return -v + n * (2.0 * float(v @ n))

    @staticmethod
    def refract(v, n, eta):
        """util.rs:37-43; None on total internal reflection."""
        dn = float(v @ n)
        cos2 = 1.0 - eta * eta * (1.0 - dn * dn)
        if cos2 > 0.0:
            return -v * eta - n * (eta * (-dn) + math.sqrt(cos2))
        return None

    @staticmethod
    def _signed_mod(b, m):
        # lambert.rs:58-64
        return math.fmod(b, m) if b > 0.0 else m - math.fmod(-b, m)

    @classmethod
    def checker(cls, u, v):
        # lambert.rs:66-90 constants verbatim
        lw, li, sw, si, cw, ci = 2.0, 150.0, 1.0, 30.0, 150.0, 300.0
        lu, lv = cls._signed_mod(u, li), cls._signed_mod(v, li)
        su, sv = cls._signed_mod(u, si), cls._signed_mod(v, si)
        cu, cv = cls._signed_mod(u, ci), cls._signed_mod(v, ci)
        if lu < lw or lv < lw:
            return 0.5
        if su < sw or sv < sw:
            return 0.6
        if (cu < cw or cv < cw) and not (cu < cw and cv < cw):
            return 0.8
        return 1.0

    def mat_weight(self, m):
        return float(np.max(self.mat_color[m]))

    def _ggx_ndf(self, m, h, on):
        a2 = self.mat_alpha[m] ** 4  # alpha = roughness^2; a2 = alpha^2
        mdn = float(h @ on)
        x = (a2 - 1.0) * mdn * mdn + 1.0
        return a2 / (PI * x * x)

    def _ggx_g1(self, m, v, on):
        a2 = self.mat_alpha[m] ** 4
        cos = float(v @ on)
        tan2 = 1.0 / (cos * cos) - 1.0
        return 2.0 / (1.0 + math.sqrt(1.0 + a2 * tan2 * tan2))

    def _fresnel_exact(self, n1, n2, out, refr, on):
        # ideal_refraction.rs:138-150: exact (s+p)/2
        cos1 = float(out @ on)
        cos2 = float(refr @ -on)
        rs = ((n1 * cos1 - n2 * cos2) / (n1 * cos1 + n2 * cos2)) ** 2
        rp = ((n1 * cos2 - n2 * cos1) / (n1 * cos2 + n2 * cos1)) ** 2
        return (rs + rp) / 2.0

    def _ior_pair(self, m, out, n):
        # ideal_refraction.rs:117-136
        if float(out @ n) > 0.0:
            return 1.0, float(self.mat_ior[m])
        return float(self.mat_ior[m]), 1.0

    def mat_brdf(self, m, out, in_, n, pos):
        t = self.mat_type[m]
        if t == 0:  # Lambert (lambert.rs:32-35)
            return (
                self.mat_color[m] * self.checker(pos[0], pos[2]) / PI
            )
        on = self.orienting_normal(out, n)
        if t == 1:  # Phong (phong.rs:37-45)
            if float(in_ @ on) <= 0.0:
                return np.zeros(3)
            r = self.reflect(out, on)
            cos = float(r @ in_)
            a = float(self.mat_alpha[m])
            return self.mat_color[m] * (
                (a + 2.0) / (2.0 * PI) * cos**a
            )
        if t == 2:  # Blinn-Phong (blinn_phong.rs:37-47)
            if float(in_ @ on) <= 0.0:
                return np.zeros(3)
            h = in_ + out
            h = h / np.linalg.norm(h)
            cos = float(h @ on)
            a = float(self.mat_alpha[m])
            return self.mat_color[m] * (
                (a + 2.0)
                * (a + 4.0)
                / (8.0 * PI * (2.0 ** (-a / 2.0) + a))
                * cos**a
            )
        if t == 3:  # GGX (ggx.rs:71-85)
            if float(in_ @ on) <= 0.0:
                return np.zeros(3)
            h = in_ + out
            h = h / np.linalg.norm(h)
            nnn = 1.0 - float(self.mat_ior[m])
            nnp = 1.0 + float(self.mat_ior[m])
            f0 = (nnn * nnn) / (nnp * nnp)
            c = float(in_ @ h)
            f = f0 + (1.0 - f0) * (1.0 - c) ** 5
            g = self._ggx_g1(m, in_, on) * self._ggx_g1(m, out, on)
            d = self._ggx_ndf(m, h, on)
            return self.mat_color[m] * (
                f * g * d / (4.0 * float(in_ @ on) * float(out @ on))
            )
        # Ideal refraction (ideal_refraction.rs:39-66); DELTA_FUNC = 1
        from_ior, to_ior = self._ior_pair(m, out, n)
        r = self.refract(out, on, from_ior / to_ior)
        if r is None:  # total internal reflection
            return self.mat_color[m] / float(in_ @ n)
        fr = self._fresnel_exact(from_ior, to_ior, out, r, on)
        if float(in_ @ on) > 0.0:  # reflection branch
            return self.mat_color[m] / float(in_ @ n) * fr
        ft = (1.0 - fr) * (to_ior / from_ior) ** 2
        return self.mat_color[m] / float(in_ @ n) * ft

    def mat_sample(self, m, out, n):
        """-> (direction, pdf), mirroring each material's sample()."""
        t = self.mat_type[m]
        on = self.orienting_normal(out, n)
        if t == 0:  # lambert.rs:37-55
            w = on
            u, v = self.onb(w)
            r1 = 2.0 * PI * self.rand()
            r2 = self.rand()
            r2s = math.sqrt(r2)
            s = np.array(
                [
                    math.cos(r1) * r2s,
                    math.sin(r1) * r2s,
                    math.sqrt(1.0 - r2),
                ]
            )
            in_ = u * s[0] + v * s[1] + w * s[2]
            # pdf uses the RAW normal (lambert.rs:47-50) — quirk.
            return in_, float(in_ @ n) / PI
        if t == 1:  # phong.rs:47-68: lobe around the mirror direction
            a = float(self.mat_alpha[m])
            r = self.reflect(out, on)
            u, v = self.onb(r)
            r1 = 2.0 * PI * self.rand()
            r2 = self.rand()
            tt = r2 ** (1.0 / (a + 2.0))
            ts = math.sqrt(1.0 - tt * tt)
            in_ = u * (math.cos(r1) * ts) + v * (math.sin(r1) * ts) + r * tt
            cos = float(r @ in_)
            return in_, (a + 2.0) / (2.0 * PI) * cos**a
        if t == 2:  # blinn_phong.rs:49-72: half-vector around the normal
            a = float(self.mat_alpha[m])
            u, v = self.onb(on)
            r1 = 2.0 * PI * self.rand()
            r2 = self.rand()
            tt = r2 ** (1.0 / (a + 2.0))
            ts = math.sqrt(1.0 - tt * tt)
            h = u * (math.cos(r1) * ts) + v * (math.sin(r1) * ts) + on * tt
            in_ = h * (2.0 * float(out @ h)) - out
            cos = float(on @ h)
            # pdf left in half-vector measure, no Jacobian (quirk #15)
            return in_, (a + 2.0) / (2.0 * PI) * cos**a
        if t == 3:  # ggx.rs:87-113: NDF importance sampling
            alpha = float(self.mat_alpha[m]) ** 2
            u, v = self.onb(on)
            r1 = 2.0 * PI * self.rand()
            r2 = self.rand()
            tan = alpha * math.sqrt(r2 / (1.0 - r2))
            x = 1.0 + tan * tan
            cos = 1.0 / math.sqrt(x)
            sin = tan / math.sqrt(x)
            h = u * (math.cos(r1) * sin) + v * (math.sin(r1) * sin) + on * cos
            o_h = float(out @ h)
            in_ = h * (2.0 * o_h) - out
            pdf = self._ggx_ndf(m, h, on) * float(h @ on) / (4.0 * o_h)
            return in_, pdf
        # ideal_refraction.rs:68-104
        from_ior, to_ior = self._ior_pair(m, out, n)
        r = self.refract(out, on, from_ior / to_ior)
        if r is None:
            return self.reflect(out, on), 1.0
        fr = self._fresnel_exact(from_ior, to_ior, out, r, on)
        if self.rand() < fr:
            return self.reflect(out, on), fr
        return r, 1.0 - fr

    def mat_coef(self, m, out, n, dist):
        # ideal_refraction.rs:106-113 (Beer-Lambert when exiting);
        # default 1 for every other material (traits.rs:20-22).
        if self.mat_type[m] == 4 and float(out @ n) < 0.0:
            v = (
                -(np.ones(3) - self.mat_color[m])
                * float(self.mat_absorb[m])
                * dist
            )
            return np.exp(v)
        return np.ones(3)

    # ---------------------------------------------------------------- NEE
    def sample_emission(self):
        """objects.rs:37-51: pick light prop. to area by linear roulette."""
        roulette = self.emission_area * self.rand()
        area = 0.0
        for i in range(self.light_prim.shape[0]):
            area += float(self.light_area[i])
            if roulette <= area:
                if self.light_is_tri[i]:
                    # triangle.rs:140-149 min/max trick
                    u, v = self.rand(), self.rand()
                    mn, mx = min(u, v), max(u, v)
                    p0 = self.light_p0[i]
                    p1 = p0 + self.light_e1[i]
                    p2 = p0 + self.light_e2[i]
                    pt = p0 * mn + p1 * (1.0 - mx) + p2 * (mx - mn)
                else:
                    # sphere.rs:79-84 FULL-sphere uniform (quirk #10)
                    r1 = 2.0 * PI * self.rand()
                    r2 = self.rand() * 2.0 - 1.0
                    r2s = math.sqrt(1.0 - r2 * r2)
                    pt = self.light_c[i] + self.light_r[i] * np.array(
                        [math.cos(r1) * r2s, math.sin(r1) * r2s, r2]
                    )
                pdf = (1.0 / float(self.light_area[i])) * (
                    float(self.light_area[i]) / self.emission_area
                )
                return pt, pdf
        raise AssertionError("unreachable (objects.rs:50)")

    # ----------------------------------------------------------- estimator
    def russian_roulette(self, init, depth):
        # scene.rs:64-76
        p = init
        if depth > self.depth_limit:
            p *= 0.5 ** (depth - self.depth_limit)
        if depth <= self.depth and p > 0.0:
            p = 1.0
        return p

    @staticmethod
    def _f32(v):
        """Round to float32 storage precision.

        The reference keeps every Vector3 in f32 (`math/vector3.rs`), so
        hit positions land ~1e-5-relative off the true surface — which,
        against the EPS=1e-3 t-cutoff and curved geometry, produces REAL
        self-intersections (a secondary ray from a point 3e-5 inside a
        r=100 sphere re-hits it at t = sqrt(2 r delta) ~ 0.08 >> EPS).
        A double-precision oracle escapes cleanly and renders measurably
        brighter on sphere silhouettes (z ~ -8 at 32^2/10 seeds); rounding
        the STORED ray state (origin, direction) to f32 reproduces the
        reference's estimator, while all arithmetic stays f64."""
        return np.asarray(v, dtype=np.float32).astype(np.float64)

    def material_interaction(self, hit, ray_d, recurse):
        # scene.rs:78-102
        t, pos, n, m = hit
        out = -ray_d
        in_, pdf = self.mat_sample(m, out, n)
        brdf = self.mat_brdf(m, out, in_, n, pos)
        coef = self.mat_coef(m, out, n, t)
        cos = float(in_ @ n)
        l_i = recurse(self._f32(pos), self._f32(in_))
        return brdf * coef * l_i * cos / pdf

    def direct_light(self, hit, ray_d):
        # scene.rs:104-151
        t, pos, n, m = hit
        if (
            float(np.sum(self.mat_emission[m] ** 2)) > 0.0
            or self.emission_area <= 0.0
        ):
            return np.zeros(3)
        pt, pdf = self.sample_emission()
        pos = self._f32(pos)  # f32 storage precision (see _f32)
        path = pt - pos
        path_norm = float(np.linalg.norm(path))
        dir_ = self._f32(path / path_norm)
        point_out = -ray_d
        point_normal = self.orienting_normal(point_out, n)
        if float(dir_ @ point_normal) <= 0.0:
            return np.zeros(3)
        shadow = self.intersect(pos, dir_)
        if shadow is None:
            return np.zeros(3)
        st, spos, snorm, smat = shadow
        if abs(st - path_norm) > EPS:
            return np.zeros(3)
        light_cos = float((-dir_) @ snorm)
        if light_cos <= 0.0:
            return np.zeros(3)
        point_cos = float(dir_ @ point_normal)
        g = point_cos * light_cos / (path_norm * path_norm)
        brdf = self.mat_brdf(m, point_out, dir_, point_normal, pos)
        l_i = self.mat_emission[smat]
        return brdf * l_i * g / pdf

    def radiance(self, o, d, depth):
        # scene.rs:24-32,153-171
        hit = self.intersect(o, d)
        if hit is None:
            return self.sky_radiance(d)
        t, pos, n, m = hit
        l_e = (
            self.mat_emission[m]
            if not (self.no_direct_emitter and depth == 0)
            and float((-d) @ n) > 0.0
            else np.zeros(3)
        )
        p = self.russian_roulette(self.mat_weight(m), depth)
        if p != 1.0 and self.rand() >= p:
            return l_e
        mr = self.material_interaction(
            hit, d, lambda po, di: self.radiance(po, di, depth + 1)
        )
        return l_e + mr / p

    def radiance_nee(self, o, d, depth, no_emission):
        # scene.rs:38-46,173-193
        hit = self.intersect(o, d)
        if hit is None:
            return self.sky_radiance(d)
        t, pos, n, m = hit
        l_e = (
            self.mat_emission[m]
            if not (self.no_direct_emitter and depth == 0)
            and not no_emission
            and float((-d) @ n) > 0.0
            else np.zeros(3)
        )
        p = self.russian_roulette(self.mat_weight(m), depth)
        if p != 1.0 and self.rand() >= p:
            return l_e
        direct = self.direct_light(hit, d)
        mr = self.material_interaction(
            hit,
            d,
            lambda po, di: self.radiance_nee(po, di, depth + 1, True),
        )
        return l_e + (direct + mr) / p

    # -------------------------------------------------------------- camera
    def camera_sample(self, x, y):
        """-> (origin, direction, pdf, g_term). camera.rs per kind."""
        if self.camera_kind == 2:  # omnidirectional (camera.rs:168-188)
            u, v = self.rand(), self.rand()
            p = (x + u) / self.width * PI * 2.0
            t = (y + v) / self.height * PI
            d = np.array(
                [
                    math.sin(t) * math.cos(p),
                    math.sin(t) * math.sin(p),
                    math.cos(t),
                ]
            )
            return self.cam_aperture, d, 1.0, 1.0
        u, v = self.rand(), self.rand()
        px = ((x + u) / self.width - 0.5) * self.cam_sensor_size[0]
        py = ((y + v) / self.height - 0.5) * self.cam_sensor_size[1]
        sensor = self.cam_position - self.cam_right * px + self.cam_up * py
        if self.camera_kind == 0:  # ideal pinhole (camera.rs:100-115)
            d = self.cam_aperture - sensor
            d = d / np.linalg.norm(d)
            return self.cam_aperture, d, 1.0, 1.0
        # thin lens (camera.rs:430-476)
        pdf_s = 1.0 / (
            (self.cam_sensor_size[0] * self.cam_sensor_size[1])
            / (self.width * self.height)
        )
        au = 2.0 * PI * self.rand()
        av = math.sqrt(self.rand()) * self.cam_aperture_radius
        ap = (
            self.cam_aperture
            + self.cam_right * (math.cos(au) * av)
            + self.cam_up * (math.sin(au) * av)
        )
        pdf_a = 1.0 / (PI * self.cam_aperture_radius**2)
        sensor_center = self.cam_aperture - sensor
        object_plane = sensor_center * (
            self.cam_focus_distance
            / float(sensor_center @ self.cam_forward)
        )
        d = self.cam_aperture + object_plane - ap
        d = d / np.linalg.norm(d)
        # camera.rs:473: geometry term of (aperture_sample - sensor_sample)
        to_sensor = ap - sensor
        to_sensor = to_sensor / np.linalg.norm(to_sensor)
        cos = float(to_sensor @ self.cam_forward)
        dist = self.cam_asd / cos
        g = cos * cos / (dist * dist)
        return ap, d, pdf_s * pdf_a, g

    def sensor_sensitivity(self):
        if self.camera_kind == 1:
            return self.cam_sensitivity
        return 1.0

    # --------------------------------------------------------------- render
    def render(self, seed, spp=None):
        """main.rs:92-121: per-pixel loop, x-outer/y-inner, mean over spp."""
        self._rng = random.Random(seed)
        spp = self.spp if spp is None else spp
        nee = self.integrator != "pt"
        film = np.zeros((self.height, self.width, 3))
        old_limit = sys.getrecursionlimit()
        sys.setrecursionlimit(50000)
        try:
            for x in range(self.width):
                for y in range(self.height):
                    acc = np.zeros(3)
                    for _ in range(spp):
                        o, d, pdf, g = self.camera_sample(x, y)
                        o, d = self._f32(o), self._f32(d)
                        if nee:
                            li = self.radiance_nee(o, d, 0, False)
                        else:
                            li = self.radiance(o, d, 0)
                        acc += li * g * (self.sensor_sensitivity() / pdf)
                    film[y, x] = acc / spp
        finally:
            sys.setrecursionlimit(old_limit)
        return film


def render_oracle(compiled, seed, spp=None):
    return OracleScene(compiled).render(seed, spp=spp)
