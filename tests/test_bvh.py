"""SAH builder + stackless traversal: structure invariants and the
brute-force dual oracle (exhaustive hit parity on random scenes)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lumillyrender_tpu.accel import sah
from lumillyrender_tpu.ops.intersect import intersect_brute, intersect_bvh
from lumillyrender_tpu.scene.data import Bvh, Geometry


def random_scene(rng, T=40, S=8, spread=3.0):
    p0 = rng.normal(size=(T, 3)).astype(np.float32) * spread
    e1 = rng.normal(size=(T, 3)).astype(np.float32)
    e2 = rng.normal(size=(T, 3)).astype(np.float32)
    n = np.cross(e1, e2)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    sc = rng.normal(size=(S, 3)).astype(np.float32) * spread
    sr = (rng.random(S).astype(np.float32) * 0.5 + 0.2)
    geom = Geometry(
        tri_p0=jnp.asarray(p0), tri_e1=jnp.asarray(e1), tri_e2=jnp.asarray(e2),
        tri_n=jnp.asarray(n), tri_mat=jnp.zeros(T, jnp.int32),
        sph_c=jnp.asarray(sc), sph_r=jnp.asarray(sr),
        sph_mat=jnp.zeros(S, jnp.int32),
    )
    mins, maxs, cent = sah.prim_aabbs(p0, e1, e2, sc, sr)
    return geom, sah.build(mins, maxs, cent)


def as_bvh(fb: sah.FlatBvh) -> Bvh:
    return Bvh(
        node_min=jnp.asarray(fb.node_min), node_max=jnp.asarray(fb.node_max),
        node_miss=jnp.asarray(fb.node_miss), node_leaf=jnp.asarray(fb.node_leaf),
    )


def test_structure_invariants():
    rng = np.random.default_rng(3)
    _, fb = random_scene(rng, T=33, S=5)
    p = 38
    n = fb.node_min.shape[0]
    assert n == 2 * p - 1
    # Every prim appears exactly once as a leaf.
    leaves = fb.node_leaf[fb.node_leaf >= 0]
    assert sorted(leaves.tolist()) == list(range(p))
    # Miss links point strictly forward (DFS order) or terminate.
    idx = np.arange(n)
    assert np.all((fb.node_miss > idx) | (fb.node_miss == -1))
    # Root AABB must bound every node AABB.
    assert np.all(fb.node_min[0] <= fb.node_min.min(axis=0) + 1e-5)
    assert np.all(fb.node_max[0] >= fb.node_max.max(axis=0) - 1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_traversal_matches_brute(seed):
    rng = np.random.default_rng(seed)
    geom, fb = random_scene(rng)
    bvh = as_bvh(fb)
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
    # The overwhelming majority must agree exactly.
    assert differs.mean() < 0.01


def test_single_prim():
    rng = np.random.default_rng(9)
    geom, fb = random_scene(rng, T=1, S=0)
    assert fb.node_min.shape[0] == 1
    assert fb.node_leaf[0] == 0
    bvh = as_bvh(fb)
    o = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32) * 3)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    h1, h2 = intersect_brute(o, d, geom), intersect_bvh(o, d, geom, bvh)
    assert np.allclose(np.asarray(h1.t), np.asarray(h2.t), atol=1e-4)


def test_reference_cost_model_split():
    """Hand-checkable SAH split: three well-separated clusters on the x axis
    must split between the clusters, not inside one."""
    mins = np.array([[0, 0, 0], [1, 0, 0], [10, 0, 0], [11, 0, 0]], np.float64)
    maxs = mins + 1.0
    cent = (mins + maxs) / 2
    fb = sah.build(mins, maxs, cent)
    # Root's left subtree must contain prims {0,1} (x-sorted split at 2).
    # Nodes: 0=root, 1=left-inner, {2,3}=leaves of left, then right subtree.
    left_leaves = []
    i = 1
    while i != fb.node_miss[1] and i < fb.node_min.shape[0]:
        if fb.node_leaf[i] >= 0:
            left_leaves.append(int(fb.node_leaf[i]))
        i += 1
    assert sorted(left_leaves) == [0, 1]
