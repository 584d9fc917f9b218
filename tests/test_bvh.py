"""SAH builder + treelet traversal: structure invariants, the brute-force
dual oracle (exhaustive hit parity on random scenes), and numpy/native
range-builder parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from lumillyrender_tpu.accel import pack, sah
from lumillyrender_tpu.ops.intersect import intersect_brute, intersect_bvh
from lumillyrender_tpu.scene.data import Bvh, Geometry


def random_scene(rng, T=40, S=8, spread=3.0, max_leaf=4):
    p0 = rng.normal(size=(T, 3)).astype(np.float32) * spread
    e1 = rng.normal(size=(T, 3)).astype(np.float32)
    e2 = rng.normal(size=(T, 3)).astype(np.float32)
    n = np.cross(e1, e2)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    sc = rng.normal(size=(S, 3)).astype(np.float32) * spread
    sr = (rng.random(S).astype(np.float32) * 0.5 + 0.2) if S else np.zeros(0, np.float32)
    geom = Geometry(
        tri_p0=jnp.asarray(p0), tri_e1=jnp.asarray(e1), tri_e2=jnp.asarray(e2),
        tri_n=jnp.asarray(n), tri_mat=jnp.zeros(T, jnp.int32),
        sph_c=jnp.asarray(sc.reshape(-1, 3)), sph_r=jnp.asarray(sr),
        sph_mat=jnp.zeros(S, jnp.int32),
    )
    arrays = pack.build_tri_bvh(p0, e1, e2, max_leaf=max_leaf)
    bvh = Bvh(**{k: jnp.asarray(v) for k, v in arrays.items()})
    return geom, arrays, bvh


def test_structure_invariants():
    rng = np.random.default_rng(3)
    _, arrays, _ = random_scene(rng, T=37, S=0, max_leaf=4)
    n = arrays["node_min"].shape[0]
    # Every prim appears exactly once across leaf blocks.
    prims = arrays["blk_prim"][arrays["blk_prim"] >= 0]
    assert sorted(prims.tolist()) == list(range(37))
    # Miss links point strictly forward (DFS order) or terminate.
    idx = np.arange(n)
    assert np.all((arrays["node_miss"] > idx) | (arrays["node_miss"] == -1))
    # Every leaf block referenced exactly once.
    blocks = arrays["node_leaf"][arrays["node_leaf"] >= 0]
    assert sorted(blocks.tolist()) == list(range(arrays["blk_p0"].shape[0]))
    # Root AABB bounds every node AABB.
    assert np.all(arrays["node_min"][0] <= arrays["node_min"].min(axis=0) + 1e-5)
    assert np.all(arrays["node_max"][0] >= arrays["node_max"].max(axis=0) - 1e-5)


@pytest.mark.parametrize("seed,max_leaf", [(0, 1), (1, 4), (2, 16)])
def test_traversal_matches_brute(seed, max_leaf):
    rng = np.random.default_rng(seed)
    geom, _, bvh = random_scene(rng, max_leaf=max_leaf)
    N = 1500
    o = (rng.normal(size=(N, 3)) * 4).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    h1 = intersect_brute(jnp.asarray(o), jnp.asarray(d), geom)
    h2 = intersect_bvh(jnp.asarray(o), jnp.asarray(d), geom, bvh)
    t1, t2 = np.asarray(h1.t), np.asarray(h2.t)
    p1, p2 = np.asarray(h1.prim), np.asarray(h2.prim)
    # t must agree tightly everywhere (float reassociation only); prim may
    # legitimately differ only where two prims tie in t.
    assert np.abs(t1 - t2).max() < 1e-3
    differs = p1 != p2
    assert np.all(np.abs(t1[differs] - t2[differs]) < 1e-3)
    assert differs.mean() < 0.01


def test_spheres_only():
    rng = np.random.default_rng(9)
    geom, _, bvh = random_scene(rng, T=0, S=6)
    o = jnp.asarray((rng.normal(size=(128, 3)) * 4).astype(np.float32))
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    h1, h2 = intersect_brute(o, d, geom), intersect_bvh(o, d, geom, bvh)
    assert np.allclose(np.asarray(h1.t), np.asarray(h2.t), atol=1e-4)
    assert np.array_equal(np.asarray(h1.prim), np.asarray(h2.prim))


def test_range_builder_numpy_native_parity():
    native = pytest.importorskip("lumillyrender_tpu.accel.native")
    if not native.available():
        pytest.skip("native builder unavailable")
    rng = np.random.default_rng(11)
    for max_leaf in (1, 4, 16):
        P = int(rng.integers(2, 300))
        mins = rng.normal(size=(P, 3)) * 3
        maxs = mins + rng.random((P, 3))
        cent = (mins + maxs) / 2
        a = sah.build_ranges(mins, maxs, cent, max_leaf)
        b = native.build_ranges(mins, maxs, cent, max_leaf)
        assert np.array_equal(a.node_miss, b.node_miss)
        assert np.array_equal(a.leaf_start, b.leaf_start)
        assert np.array_equal(a.leaf_count, b.leaf_count)
        assert np.array_equal(a.perm, b.perm)
        assert np.allclose(a.node_min, b.node_min, atol=1e-6)


def test_reference_cost_model_split():
    """Hand-checkable SAH split: clusters on the x axis must split between
    the clusters, not inside one."""
    mins = np.array([[0, 0, 0], [1, 0, 0], [10, 0, 0], [11, 0, 0]], np.float64)
    maxs = mins + 1.0
    cent = (mins + maxs) / 2
    rb = sah.build_ranges(mins, maxs, cent, max_leaf=1)
    # Root splits 2/2: left subtree holds prims {0,1}.
    # DFS: 0=root, 1=left-inner, 2,3 = leaves.
    assert rb.leaf_start[0] == -1
    left_prims = sorted(rb.perm[:2].tolist())
    assert left_prims == [0, 1]


def test_bvh_fused_shade_matches_brute():
    """intersect_bvh(want_shade=True) == brute + shade_point on a random
    triangle cloud with spheres and mixed material rows."""
    import numpy as np
    from lumillyrender_tpu.accel.pack import build_tri_bvh
    from lumillyrender_tpu.ops.intersect import (
        intersect_brute,
        intersect_bvh,
        shade_point,
    )
    from lumillyrender_tpu.scene.data import Bvh, Geometry, as_device

    rng = np.random.default_rng(11)
    nt, ns, n = 300, 4, 512
    p0 = rng.uniform(-5, 5, (nt, 3))
    e1 = rng.uniform(-1.5, 1.5, (nt, 3))
    e2 = rng.uniform(-1.5, 1.5, (nt, 3))
    nrm = np.cross(e1, e2)
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
    tmat = (np.arange(nt) % 5).astype(np.int32)
    geom = as_device(Geometry(
        tri_p0=p0, tri_e1=e1, tri_e2=e2, tri_n=nrm, tri_mat=tmat,
        sph_c=rng.uniform(-5, 5, (ns, 3)),
        sph_r=rng.uniform(0.2, 1.0, ns),
        sph_mat=((np.arange(ns) + 2) % 5).astype(np.int32),
    ))
    bvh = as_device(Bvh(**build_tri_bvh(p0, e1, e2, tri_n=nrm, tri_mat=tmat,
                                        max_leaf=8)))

    o = jnp.asarray(rng.uniform(-8, 8, (n, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    hit_ref = intersect_brute(o, d, geom)
    sp_ref = shade_point(o, d, hit_ref, geom)
    hit, sp = intersect_bvh(o, d, geom, bvh, want_shade=True)

    assert int(jnp.sum(hit.prim >= 0)) > 50
    # t agrees to float-contraction noise only: the brute path evaluates MT
    # on shared (C,N) chunks while the BVH flush evaluates it on per-lane
    # (n,K) slabs, so XLA picks different FMA groupings (~1e-6 relative).
    t, t_ref = np.asarray(hit.t), np.asarray(hit_ref.t)
    p, p_ref = np.asarray(hit.prim), np.asarray(hit_ref.prim)
    np.testing.assert_allclose(t, t_ref, rtol=1e-5, atol=1e-4)
    # prim/mat/normal may differ only where two prims (near-)tie in t.
    differs = p != p_ref
    assert differs.mean() < 0.01
    assert np.all(np.abs(t[differs] - t_ref[differs]) < 1e-3)
    same = ~differs
    np.testing.assert_array_equal(
        np.asarray(sp.mat)[same], np.asarray(sp_ref.mat)[same]
    )
    # Sphere normals derive from hit position, so the t-noise propagates
    # scaled by ~1/radius — 1e-4 bounds it comfortably.
    np.testing.assert_allclose(
        np.asarray(sp.normal)[same], np.asarray(sp_ref.normal)[same], atol=1e-4
    )
