"""Pallas packet-traversal kernel: parity + gradient gates.

Runs the TPU kernel in interpreter mode on the CPU mesh (the numerics are
identical; Mosaic lowering is exercised by tools/bench_pallas.py on real
hardware). Oracle: the brute-force streaming intersector, which the XLA
walk is itself gated against (tests/test_bvh.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lumillyrender_tpu.accel.pack import build_tri_bvh
from lumillyrender_tpu.ops.intersect import (
    intersect_bvh,
    intersect_shade_brute,
)
from lumillyrender_tpu.scene.data import Bvh, Geometry


def _scene(seed=0, tris=257, spheres=4):
    rng = np.random.default_rng(seed)
    p0 = rng.normal(size=(tris, 3)).astype(np.float32)
    e1 = (rng.normal(size=(tris, 3)) * 0.4).astype(np.float32)
    e2 = (rng.normal(size=(tris, 3)) * 0.4).astype(np.float32)
    nrm = np.cross(e1, e2)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-9)
    tmat = rng.integers(0, 4, size=tris).astype(np.int32)
    sc = (rng.normal(size=(spheres, 3)) * 1.5).astype(np.float32)
    sr = rng.uniform(0.2, 0.6, size=spheres).astype(np.float32)
    smat = rng.integers(0, 4, size=spheres).astype(np.int32)
    geom = Geometry(
        tri_p0=jnp.asarray(p0), tri_e1=jnp.asarray(e1),
        tri_e2=jnp.asarray(e2), tri_n=jnp.asarray(nrm),
        tri_mat=jnp.asarray(tmat), sph_c=jnp.asarray(sc),
        sph_r=jnp.asarray(sr), sph_mat=jnp.asarray(smat),
    )
    return geom, (p0, e1, e2, nrm, tmat)


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = (rng.normal(size=(n, 3)) * 3.0).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("max_leaf", [16, 64])
def test_pallas_matches_brute(max_leaf):
    geom, (p0, e1, e2, nrm, tmat) = _scene()
    arrays = build_tri_bvh(p0, e1, e2, tri_n=nrm, tri_mat=tmat,
                           max_leaf=max_leaf)
    bvh = Bvh(**{k: jnp.asarray(v) for k, v in arrays.items()})
    # 1500 rays: exercises the non-multiple-of-1024 padding path.
    o, d = _rays(1500)

    hit_b, sp_b = intersect_shade_brute(o, d, geom)
    hit_p, sp_p = intersect_bvh(
        o, d, geom, bvh, want_shade=True, use_pallas=True,
        pallas_interpret=True,
    )

    t_b, t_p = np.asarray(hit_b.t), np.asarray(hit_p.t)
    np.testing.assert_allclose(t_p, t_b, rtol=1e-3, atol=1e-3)
    # prims may differ only at t-ties within tolerance
    same = np.asarray(hit_b.prim) == np.asarray(hit_p.prim)
    tie = np.abs(t_b - t_p) <= 1e-3 * np.maximum(np.abs(t_b), 1.0)
    assert np.all(same | tie)
    assert np.all(
        (np.asarray(sp_b.mat) == np.asarray(sp_p.mat)) | ~same
    )
    nd = np.abs(np.asarray(sp_b.normal) - np.asarray(sp_p.normal)).max(1)
    assert nd[same].max() < 1e-4


def test_pallas_no_shade_path():
    geom, (p0, e1, e2, nrm, tmat) = _scene(seed=3)
    arrays = build_tri_bvh(p0, e1, e2, tri_n=nrm, tri_mat=tmat, max_leaf=32)
    bvh = Bvh(**{k: jnp.asarray(v) for k, v in arrays.items()})
    o, d = _rays(1024, seed=4)
    hit_b, _ = intersect_shade_brute(o, d, geom)
    hit_p = intersect_bvh(o, d, geom, bvh, use_pallas=True,
                          pallas_interpret=True)
    np.testing.assert_allclose(
        np.asarray(hit_p.t), np.asarray(hit_b.t), rtol=1e-3, atol=1e-3
    )


def test_pallas_gradient_matches_brute():
    """d(sum of tri-hit t)/d(o,d) through the custom_vjp matches autodiff
    through the brute intersector (the plane-equation derivative)."""
    geom, (p0, e1, e2, nrm, tmat) = _scene(seed=7, tris=64, spheres=0)
    arrays = build_tri_bvh(p0, e1, e2, tri_n=nrm, tri_mat=tmat, max_leaf=16)
    bvh = Bvh(**{k: jnp.asarray(v) for k, v in arrays.items()})
    o, d = _rays(512, seed=8)

    def f_pallas(o_, d_):
        h = intersect_bvh(o_, d_, geom, bvh, use_pallas=True,
                          pallas_interpret=True)
        return jnp.sum(jnp.where(h.prim >= 0, h.t, 0.0))

    def f_brute(o_, d_):
        h, _ = intersect_shade_brute(o_, d_, geom)
        return jnp.sum(jnp.where(h.prim >= 0, h.t, 0.0))

    go_p, gd_p = jax.grad(f_pallas, argnums=(0, 1))(o, d)
    go_b, gd_b = jax.grad(f_brute, argnums=(0, 1))(o, d)
    np.testing.assert_allclose(np.asarray(go_p), np.asarray(go_b),
                               rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gd_p), np.asarray(gd_b),
                               rtol=1e-2, atol=1e-3)


def test_pallas_prune_threshold_respected():
    """Rays whose sphere pre-pass t is closer than every triangle keep the
    sphere hit (prim id >= nt untouched)."""
    geom, (p0, e1, e2, nrm, tmat) = _scene(seed=11)
    arrays = build_tri_bvh(p0, e1, e2, tri_n=nrm, tri_mat=tmat, max_leaf=64)
    bvh = Bvh(**{k: jnp.asarray(v) for k, v in arrays.items()})
    o, d = _rays(1024, seed=12)
    hit_p, sp_p = intersect_bvh(
        o, d, geom, bvh, want_shade=True, use_pallas=True,
        pallas_interpret=True,
    )
    hit_b, sp_b = intersect_shade_brute(o, d, geom)
    nt = geom.tri_p0.shape[0]
    sph_lanes = np.asarray(hit_b.prim) >= nt
    assert sph_lanes.any()
    np.testing.assert_array_equal(
        np.asarray(hit_p.prim)[sph_lanes], np.asarray(hit_b.prim)[sph_lanes]
    )
    np.testing.assert_array_equal(
        np.asarray(sp_p.mat)[sph_lanes], np.asarray(sp_b.mat)[sph_lanes]
    )


@pytest.mark.parametrize("want_shade", [False, True])
def test_pallas_streamed_matches_brute(want_shade):
    """HBM-streaming kernel (leaf treelets DMA'd per visit) must agree with
    the brute oracle exactly like the resident kernel does."""
    geom, (p0, e1, e2, nrm, tmat) = _scene(seed=21, tris=513)
    arrays = build_tri_bvh(p0, e1, e2, tri_n=nrm, tri_mat=tmat, max_leaf=32)
    bvh = Bvh(**{k: jnp.asarray(v) for k, v in arrays.items()})
    o, d = _rays(1500, seed=22)

    hit_b, sp_b = intersect_shade_brute(o, d, geom)
    res = intersect_bvh(
        o, d, geom, bvh, want_shade=want_shade, use_pallas=True,
        pallas_interpret=True, pallas_streamed=True,
    )
    hit_p = res[0] if want_shade else res

    t_b, t_p = np.asarray(hit_b.t), np.asarray(hit_p.t)
    np.testing.assert_allclose(t_p, t_b, rtol=1e-3, atol=1e-3)
    same = np.asarray(hit_b.prim) == np.asarray(hit_p.prim)
    tie = np.abs(t_b - t_p) <= 1e-3 * np.maximum(np.abs(t_b), 1.0)
    assert np.all(same | tie)
    if want_shade:
        sp_p = res[1]
        assert np.all((np.asarray(sp_b.mat) == np.asarray(sp_p.mat)) | ~same)
        nd = np.abs(np.asarray(sp_b.normal) - np.asarray(sp_p.normal)).max(1)
        assert nd[same].max() < 1e-4


def test_pallas_streamed_matches_resident():
    """Same inputs through both kernel variants -> bit-identical outputs
    (identical math; only the treelet fetch mechanism differs)."""
    geom, (p0, e1, e2, nrm, tmat) = _scene(seed=31, tris=300)
    arrays = build_tri_bvh(p0, e1, e2, tri_n=nrm, tri_mat=tmat, max_leaf=32)
    bvh = Bvh(**{k: jnp.asarray(v) for k, v in arrays.items()})
    o, d = _rays(2048, seed=32)
    h_r, sp_r = intersect_bvh(
        o, d, geom, bvh, want_shade=True, use_pallas=True,
        pallas_interpret=True, pallas_streamed=False,
    )
    h_s, sp_s = intersect_bvh(
        o, d, geom, bvh, want_shade=True, use_pallas=True,
        pallas_interpret=True, pallas_streamed=True,
    )
    np.testing.assert_array_equal(np.asarray(h_r.t), np.asarray(h_s.t))
    np.testing.assert_array_equal(np.asarray(h_r.prim), np.asarray(h_s.prim))
    np.testing.assert_array_equal(np.asarray(sp_r.mat), np.asarray(sp_s.mat))
    np.testing.assert_array_equal(
        np.asarray(sp_r.normal), np.asarray(sp_s.normal)
    )


@pytest.mark.parametrize("streamed", [False, True])
def test_occlusion_early_stop_verdict_parity(streamed):
    """occlusion=True may stop early and report a different (non-nearest)
    hit, but the visibility VERDICT |t - dist| <= EPS must match the exact
    nearest-hit query on every lane."""
    from lumillyrender_tpu.constants import EPS
    from lumillyrender_tpu.ops.intersect import intersect_bvh

    geom, (p0, e1, e2, nrm, tmat) = _scene(seed=41, tris=400)
    arrays = build_tri_bvh(p0, e1, e2, tri_n=nrm, tri_mat=tmat, max_leaf=16)
    bvh = Bvh(**{k: jnp.asarray(v) for k, v in arrays.items()})
    o, d = _rays(2048, seed=42)
    # Fake light distances spanning hit/miss/boundary regimes.
    rng = np.random.default_rng(43)
    dist = jnp.asarray(rng.uniform(0.3, 6.0, size=2048).astype(np.float32))
    cap = dist + 2.0 * EPS

    h_ex, _ = intersect_bvh(
        o, d, geom, bvh, want_shade=True, use_pallas=True,
        pallas_interpret=True, pallas_streamed=streamed, t_cap=cap,
    )
    h_oc, sp_oc = intersect_bvh(
        o, d, geom, bvh, want_shade=True, use_pallas=True,
        pallas_interpret=True, pallas_streamed=streamed, t_cap=cap,
        occlusion=True,
    )
    vis_ex = np.asarray(h_ex.prim >= 0) & (
        np.abs(np.asarray(h_ex.t) - np.asarray(dist)) <= EPS
    )
    vis_oc = np.asarray(sp_oc.hit) & (
        np.abs(np.asarray(h_oc.t) - np.asarray(dist)) <= EPS
    )
    np.testing.assert_array_equal(vis_oc, vis_ex)
    # Note: reported t often matches the exact query anyway — a stopped
    # lane still rides leaf tests triggered by its packet-mates; the win
    # is pruned node descends, which this gate doesn't observe. What it
    # DOES pin is that early-stopping never flips a visibility verdict.


def test_occlusion_early_stop_verdict_parity_walk():
    """Same verdict-parity gate through the XLA walk backend."""
    from lumillyrender_tpu.constants import EPS
    from lumillyrender_tpu.ops.intersect import intersect_bvh

    geom, (p0, e1, e2, nrm, tmat) = _scene(seed=51, tris=400)
    arrays = build_tri_bvh(p0, e1, e2, tri_n=nrm, tri_mat=tmat, max_leaf=16)
    bvh = Bvh(**{k: jnp.asarray(v) for k, v in arrays.items()})
    o, d = _rays(2048, seed=52)
    rng = np.random.default_rng(53)
    dist = jnp.asarray(rng.uniform(0.3, 6.0, size=2048).astype(np.float32))
    cap = dist + 2.0 * EPS

    h_ex, _ = intersect_bvh(o, d, geom, bvh, want_shade=True, t_cap=cap)
    h_oc, sp_oc = intersect_bvh(
        o, d, geom, bvh, want_shade=True, t_cap=cap, occlusion=True
    )
    vis_ex = np.asarray(h_ex.prim >= 0) & (
        np.abs(np.asarray(h_ex.t) - np.asarray(dist)) <= EPS
    )
    vis_oc = np.asarray(sp_oc.hit) & (
        np.abs(np.asarray(h_oc.t) - np.asarray(dist)) <= EPS
    )
    np.testing.assert_array_equal(vis_oc, vis_ex)


def test_resolve_streamed_auto_selection(monkeypatch):
    """_resolve must keep big meshes on the Pallas path via the streamed
    kernel when resident tables exceed VMEM, and fall back to the XLA walk
    only when even the node table won't fit."""
    from lumillyrender_tpu.ops import intersect, pallas_bvh

    geom, (p0, e1, e2, nrm, tmat) = _scene(seed=61, tris=9000)
    arrays = build_tri_bvh(p0, e1, e2, tri_n=nrm, tri_mat=tmat, max_leaf=32)
    bvh = Bvh(**{k: jnp.asarray(v) for k, v in arrays.items()})

    monkeypatch.setattr(pallas_bvh, "on_tpu", lambda: True)
    assert intersect._resolve(geom, bvh, "auto") == "pallas"

    # Resident tables too big -> still pallas (streamed).
    monkeypatch.setattr(pallas_bvh, "VMEM_TABLE_BYTES", 1)
    assert not pallas_bvh.supported(bvh)
    assert pallas_bvh.supported_streamed(bvh)
    assert intersect._resolve(geom, bvh, "auto") == "pallas"
    # intersect_tris_pallas auto-selects streamed in that regime.
    import lumillyrender_tpu.ops.pallas_bvh as pb

    seen = {}
    orig = pb._make_diff_fn

    def spy(k, rpb, rpm, want_shade, interpret, streamed=False):
        seen["streamed"] = streamed
        return orig(k, rpb, rpm, want_shade, interpret, streamed)

    monkeypatch.setattr(pb, "_make_diff_fn", spy)
    o, d = _rays(1024, seed=62)
    pb.intersect_tris_pallas(o, d, jnp.full((1024,), 1e5), bvh, geom.tri_n,
                             interpret=True)
    assert seen["streamed"] is True

    # Node table too big -> no pallas at all.
    monkeypatch.setattr(pallas_bvh, "NODE_VMEM_BYTES", 1)
    assert intersect._resolve(geom, bvh, "auto") == "bvh"


@pytest.mark.parametrize("streamed", [False, True])
def test_reordered_traversal_is_exact(streamed):
    """Ray reordering (sort by octant|Morton before the packet kernel,
    inverse-permute after) must be EXACT: each lane still tests a superset
    of its own subtree's leaves with identical per-triangle arithmetic, so
    t/prim/shade outputs are bit-equal to the unordered call."""
    geom, raw = _scene(tris=257)
    arrays = build_tri_bvh(*raw[:3], tri_n=raw[3], tri_mat=raw[4],
                           max_leaf=16)
    bvh = Bvh(**{k: jnp.asarray(v) for k, v in arrays.items()})
    o, d = _rays(2048, seed=9)
    h0, sp0 = intersect_bvh(
        o, d, geom, bvh, want_shade=True, use_pallas=True,
        pallas_interpret=True, pallas_streamed=streamed, reorder=False,
    )
    h1, sp1 = intersect_bvh(
        o, d, geom, bvh, want_shade=True, use_pallas=True,
        pallas_interpret=True, pallas_streamed=streamed, reorder=True,
    )
    assert (np.asarray(h0.prim) == np.asarray(h1.prim)).all()
    assert (np.asarray(h0.t) == np.asarray(h1.t)).all()
    assert (np.asarray(sp0.mat) == np.asarray(sp1.mat)).all()
    assert (np.asarray(sp0.normal) == np.asarray(sp1.normal)).all()
