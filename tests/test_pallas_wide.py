"""Wide-leaf BVH kernel (ops/pallas_bvh_wide): parity + gradient gates.

Interpreter mode on CPU (numerics identical to hardware; Mosaic lowering
and the 1M-tri numbers are exercised by tools/bench_wide.py /
bench_bigmesh.py on the real chip — BIGMESH.json). Oracle: the brute-force
streaming intersector, same chain as tests/test_pallas.py.

The mesh is sized to push the node count past one 128-node chunk so the
precull chunk-crossing path (the part the packet kernel never had) is
actually walked.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumillyrender_tpu.accel.pack import build_tri_bvh
from lumillyrender_tpu.constants import INF
from lumillyrender_tpu.ops import pallas_bvh_wide as W
from lumillyrender_tpu.ops.intersect import intersect_shade_brute
from lumillyrender_tpu.scene.data import Bvh, Geometry


def _scene(seed=0, tris=9000):
    rng = np.random.default_rng(seed)
    # Clustered tris (grid of patches) so the SAH tree is deep enough to
    # span multiple preorder chunks at max_leaf=128.
    cell = rng.integers(0, 12, size=(tris, 3)).astype(np.float32)
    p0 = (cell + rng.random((tris, 3))).astype(np.float32)
    e1 = (rng.normal(size=(tris, 3)) * 0.3).astype(np.float32)
    e2 = (rng.normal(size=(tris, 3)) * 0.3).astype(np.float32)
    nrm = np.cross(e1, e2)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
    tmat = rng.integers(0, 4, size=tris).astype(np.int32)
    geom = Geometry(
        tri_p0=jnp.asarray(p0), tri_e1=jnp.asarray(e1),
        tri_e2=jnp.asarray(e2), tri_n=jnp.asarray(nrm),
        tri_mat=jnp.asarray(tmat),
        sph_c=jnp.zeros((0, 3), jnp.float32),
        sph_r=jnp.zeros((0,), jnp.float32),
        sph_mat=jnp.zeros((0,), jnp.int32),
    )
    arrays = build_tri_bvh(p0, e1, e2, tri_n=nrm, tri_mat=tmat,
                           max_leaf=128)
    bvh = Bvh(**{k: jnp.asarray(v) for k, v in arrays.items()})
    return geom, bvh


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = (rng.random((n, 3)) * 14 - 1).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.fixture(scope="module")
def wide_scene():
    return _scene()


def test_wide_spans_chunks(wide_scene):
    _, bvh = wide_scene
    assert bvh.pk_nodes.shape[0] > W.LANE, (
        "test mesh too small to cross a precull chunk boundary"
    )
    assert W.supported(bvh)


def test_wide_matches_brute(wide_scene):
    geom, bvh = wide_scene
    # 75 rays: exercises the non-multiple-of-WSUB padding path.
    o, d = _rays(75)
    t0 = jnp.full((o.shape[0],), INF)
    t_w, prim_w, mat_w, nx, ny, nz = W.intersect_tris_wide(
        o, d, t0, bvh, geom.tri_n, want_shade=True, interpret=True,
        tri_mat=geom.tri_mat,
    )
    hit_b, sp_b = intersect_shade_brute(o, d, geom)
    t_w, prim_w = np.asarray(t_w), np.asarray(prim_w)
    t_b, prim_b = np.asarray(hit_b.t), np.asarray(hit_b.prim)
    assert (prim_b >= 0).sum() > 20  # the scene actually gets hit
    np.testing.assert_allclose(t_w, t_b, rtol=1e-3, atol=1e-3)
    same = prim_b == prim_w
    tie = np.abs(t_b - t_w) <= 1e-3 * np.maximum(np.abs(t_b), 1.0)
    assert np.all(same | tie)
    assert np.all((np.asarray(sp_b.mat) == np.asarray(mat_w)) | ~same)
    nw = np.stack([np.asarray(nx), np.asarray(ny), np.asarray(nz)], 1)
    nd = np.abs(np.asarray(sp_b.normal) - nw).max(1)
    assert nd[same & (prim_b >= 0)].max() < 1e-4


def test_wide_t_init_prune_and_stop(wide_scene):
    geom, bvh = wide_scene
    o, d = _rays(40, seed=2)
    n = o.shape[0]
    inf0 = jnp.full((n,), INF)
    t_ref, prim_ref = W.intersect_tris_wide(
        o, d, inf0, bvh, geom.tri_n, interpret=True
    )
    # t_init below the true hit must return (t_init, -1).
    cap = jnp.where(jnp.asarray(prim_ref) >= 0,
                    jnp.asarray(t_ref) * 0.5, 1e-2)
    t_c, prim_c = W.intersect_tris_wide(
        o, d, cap, bvh, geom.tri_n, interpret=True
    )
    np.testing.assert_allclose(np.asarray(t_c), np.asarray(cap), rtol=1e-6)
    assert np.all(np.asarray(prim_c) == -1)
    # occlusion early-stop (stop refining once best t < t_stop) must
    # still report SOME hit on every lane that has one
    t_s, prim_s = W.intersect_tris_wide(
        o, d, inf0, bvh, geom.tri_n, interpret=True,
        t_stop=jnp.full((n,), 1e4),
    )
    won = np.asarray(prim_ref) >= 0
    assert (np.asarray(prim_s) >= 0)[won].all()
    # the reported hit may be any (not necessarily nearest) occluder
    assert (np.asarray(t_s) < INF)[won].all()


def test_wide_gradient(wide_scene):
    geom, bvh = wide_scene
    o, d = _rays(24, seed=3)
    t0 = jnp.full((o.shape[0],), INF)

    def f(oo):
        t, prim = W.intersect_tris_wide(
            oo, d, t0, bvh, geom.tri_n, interpret=True
        )
        return jnp.sum(jnp.where(prim >= 0, t, 0.0))

    g = jax.grad(f)(o)
    assert bool(jnp.isfinite(g).all())
    # central finite difference on one hit lane, along the ray direction
    t, prim = W.intersect_tris_wide(o, d, t0, bvh, geom.tri_n,
                                    interpret=True)
    lane = int(np.argmax(np.asarray(prim) >= 0))
    assert int(np.asarray(prim)[lane]) >= 0
    eps = 1e-3
    dv = np.asarray(d)[lane]
    fp = f(o.at[lane].add(eps * dv))
    fm = f(o.at[lane].add(-eps * dv))
    fd = (float(fp) - float(fm)) / (2 * eps)
    ad = float(jnp.vdot(g[lane], jnp.asarray(dv)))
    assert abs(fd - ad) < 5e-2 * max(1.0, abs(fd))
