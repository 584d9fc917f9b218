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


def _random_geom(rng, nt=23, ns=5):
    p0 = rng.uniform(-4, 4, (nt, 3)).astype(np.float32)
    p1 = p0 + rng.uniform(-2, 2, (nt, 3)).astype(np.float32)
    p2 = p0 + rng.uniform(-2, 2, (nt, 3)).astype(np.float32)
    tris = [(p0[i], p1[i], p2[i]) for i in range(nt)]
    spheres = [
        (rng.uniform(-4, 4, 3).astype(np.float32), float(rng.uniform(0.3, 1.5)))
        for _ in range(ns)
    ]
    g = make_geom(tris, spheres)
    # Distinct material rows so the fused mat select is actually exercised.
    return Geometry(
        tri_p0=g.tri_p0, tri_e1=g.tri_e1, tri_e2=g.tri_e2, tri_n=g.tri_n,
        tri_mat=jnp.asarray(np.arange(nt) % 7, jnp.int32),
        sph_c=g.sph_c, sph_r=g.sph_r,
        sph_mat=jnp.asarray((np.arange(ns) + 3) % 7, jnp.int32),
    )


def test_fused_intersect_shade_matches_separate():
    """intersect_shade_brute == intersect_brute + shade_point, bitwise."""
    from lumillyrender_tpu.ops.intersect import intersect_shade_brute

    rng = np.random.default_rng(7)
    geom = _random_geom(rng)
    n = 512
    o = jnp.asarray(rng.uniform(-6, 6, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    hit_ref = intersect_brute(o, d, geom)
    sp_ref = shade_point(o, d, hit_ref, geom)
    hit, sp = intersect_shade_brute(o, d, geom)

    assert bool(jnp.any(hit.prim >= 0)), "degenerate test: nothing hit"
    np.testing.assert_array_equal(np.asarray(hit.t), np.asarray(hit_ref.t))
    np.testing.assert_array_equal(np.asarray(hit.prim), np.asarray(hit_ref.prim))
    np.testing.assert_array_equal(np.asarray(sp.hit), np.asarray(sp_ref.hit))
    np.testing.assert_array_equal(np.asarray(sp.mat), np.asarray(sp_ref.mat))
    np.testing.assert_allclose(
        np.asarray(sp.normal), np.asarray(sp_ref.normal), atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(sp.position), np.asarray(sp_ref.position)
    )


def test_dense_take_rows_matches_take():
    from lumillyrender_tpu.ops.table import take_rows

    rng = np.random.default_rng(3)
    t1 = jnp.asarray(rng.normal(size=(11,)), jnp.float32)
    t2 = jnp.asarray(rng.normal(size=(11, 3)), jnp.float32)
    ti = jnp.asarray(rng.integers(0, 50, (11,)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 11, (200,)), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(take_rows(t1, idx)), np.asarray(jnp.take(t1, idx, axis=0))
    )
    np.testing.assert_array_equal(
        np.asarray(take_rows(t2, idx)), np.asarray(jnp.take(t2, idx, axis=0))
    )
    np.testing.assert_array_equal(
        np.asarray(take_rows(ti, idx)), np.asarray(jnp.take(ti, idx, axis=0))
    )
    # Multi-dim index shapes round-trip.
    idx2 = idx.reshape(20, 10)
    np.testing.assert_array_equal(
        np.asarray(take_rows(t2, idx2)), np.asarray(jnp.take(t2, idx2, axis=0))
    )
