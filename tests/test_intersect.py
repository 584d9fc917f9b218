"""Intersection kernels: dual-oracle cross-checks and EPS semantics.

Mirrors the reference's own test strategy (`triangle.rs:152-236`): the
Möller-Trumbore kernel is checked against an independent 3-cross-product
oracle, plus the EPS self-intersection property; spheres get analytic
checks. The BVH traversal is checked against brute force in test_bvh.py.
"""

import jax.numpy as jnp
import numpy as np

from lumillyrender_tpu.constants import EPS, INF
from lumillyrender_tpu.ops.intersect import (
    Hit,
    intersect_brute,
    shade_point,
)
from lumillyrender_tpu.scene.data import Geometry


def make_geom(tris=None, spheres=None):
    tris = tris or []
    spheres = spheres or []
    p0 = np.array([t[0] for t in tris], np.float32).reshape(-1, 3)
    p1 = np.array([t[1] for t in tris], np.float32).reshape(-1, 3)
    p2 = np.array([t[2] for t in tris], np.float32).reshape(-1, 3)
    e1, e2 = p1 - p0, p2 - p0
    n = np.cross(e1, e2)
    ln = np.linalg.norm(n, axis=-1, keepdims=True)
    n = n / np.where(ln > 0, ln, 1)
    return Geometry(
        tri_p0=jnp.asarray(p0), tri_e1=jnp.asarray(e1), tri_e2=jnp.asarray(e2),
        tri_n=jnp.asarray(n),
        tri_mat=jnp.zeros(p0.shape[0], jnp.int32),
        sph_c=jnp.array([s[0] for s in spheres], jnp.float32).reshape(-1, 3),
        sph_r=jnp.array([s[1] for s in spheres], jnp.float32),
        sph_mat=jnp.zeros(len(spheres), jnp.int32),
    )


def oracle_tri_3c(p0, p1, p2, o, d):
    """Independent 3-cross-product intersection (`triangle.rs:42-67`)."""
    normal = np.cross(p1 - p0, p2 - p0)
    normal = normal / np.linalg.norm(normal)
    dn = d @ normal
    t = (p0 - o) @ normal / dn
    if t < EPS:
        return None
    p = o + d * t
    for a, b in ((p0, p1), (p1, p2), (p2, p0)):
        if np.cross(b - a, p - a) @ normal < 0:
            return None
    return t


TRI = (np.array([5.0, 0, 0]), np.array([0.0, 0, 0]), np.array([0.0, 0, 5]))


def test_tri_front_matches_oracle():
    o = np.array([1.0, 5.0, 1.0])
    d = np.array([0.0, -1.0, 0.0])
    geom = make_geom(tris=[TRI])
    hit = intersect_brute(jnp.asarray(o[None], jnp.float32), jnp.asarray(d[None], jnp.float32), geom)
    t_oracle = oracle_tri_3c(*TRI, o, d)
    assert abs(float(hit.t[0]) - t_oracle) < 1e-3
    assert int(hit.prim[0]) == 0


def test_tri_back_matches_oracle():
    o = np.array([1.0, -5.0, 1.0])
    d = np.array([0.0, 1.0, 0.0])
    geom = make_geom(tris=[TRI])
    hit = intersect_brute(jnp.asarray(o[None], jnp.float32), jnp.asarray(d[None], jnp.float32), geom)
    t_oracle = oracle_tri_3c(*TRI, o, d)
    assert abs(float(hit.t[0]) - t_oracle) < 1e-3


def test_tri_eps_self_intersection():
    """A ray re-cast from a hit point must miss (`triangle.rs:196-235`)."""
    o = np.array([1.0, 5.0, 1.0])
    d = np.array([0.0, -1.0, 0.0])
    geom = make_geom(tris=[TRI])
    hit = intersect_brute(jnp.asarray(o[None], jnp.float32), jnp.asarray(d[None], jnp.float32), geom)
    p = o + d * float(hit.t[0])
    hit2 = intersect_brute(
        jnp.asarray(p[None], jnp.float32),
        jnp.asarray(np.array([[0.0, 1.0, 0.0]]), jnp.float32),
        geom,
    )
    assert int(hit2.prim[0]) == -1


def test_random_tris_match_oracle():
    rng = np.random.default_rng(7)
    for _ in range(50):
        tri = tuple(rng.normal(size=3) for _ in range(3))
        o = rng.normal(size=3) * 3
        d = rng.normal(size=3)
        d = d / np.linalg.norm(d)
        geom = make_geom(tris=[tri])
        hit = intersect_brute(
            jnp.asarray(o[None], jnp.float32), jnp.asarray(d[None], jnp.float32), geom
        )
        t_oracle = oracle_tri_3c(*tri, o, d)
        got = float(hit.t[0])
        if t_oracle is None:
            # MT additionally rejects |det| < EPS; oracle-None must be miss,
            # but an MT miss with oracle hit can only come from the det cut.
            if got < INF:
                raise AssertionError("MT hit where oracle missed")
        else:
            e1 = np.asarray(tri[1]) - np.asarray(tri[0])
            e2 = np.asarray(tri[2]) - np.asarray(tri[0])
            det = abs(np.cross(d, e2) @ e1)
            if det >= EPS * 2:  # away from the det cutoff, must agree
                assert abs(got - t_oracle) < 1e-3


def test_sphere_analytic():
    geom = make_geom(spheres=[((0.0, 0.0, 0.0), 1.0)])
    o = jnp.array([[0.0, 0.0, 5.0]], jnp.float32)
    d = jnp.array([[0.0, 0.0, -1.0]], jnp.float32)
    hit = intersect_brute(o, d, geom)
    assert abs(float(hit.t[0]) - 4.0) < 1e-5
    sp = shade_point(o, d, hit, geom)
    assert np.allclose(np.asarray(sp.normal[0]), [0, 0, 1], atol=1e-5)


def test_sphere_inside():
    """From inside, t1 < EPS, so the far root t2 is taken (`sphere.rs:51-54`)."""
    geom = make_geom(spheres=[((0.0, 0.0, 0.0), 1.0)])
    o = jnp.array([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.array([[0.0, 0.0, -1.0]], jnp.float32)
    hit = intersect_brute(o, d, geom)
    assert abs(float(hit.t[0]) - 1.0) < 1e-5


def test_nearest_of_many():
    geom = make_geom(
        spheres=[((0.0, 0.0, -3.0), 1.0), ((0.0, 0.0, -8.0), 1.0), ((0.0, 0.0, -5.5), 1.0)]
    )
    o = jnp.array([[0.0, 0.0, 0.0]], jnp.float32)
    d = jnp.array([[0.0, 0.0, -1.0]], jnp.float32)
    hit = intersect_brute(o, d, geom)
    assert int(hit.prim[0]) == 0
    assert abs(float(hit.t[0]) - 2.0) < 1e-5
