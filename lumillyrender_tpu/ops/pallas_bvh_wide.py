"""Wide-leaf Pallas BVH traversal: triangles on lanes, rays on sublanes.

The packet kernel (ops/pallas_bvh.py) puts 2048 RAYS in the (16, 128) tile
and walks the tree behind one scalar cursor; every visited node is the
UNION of all 2048 rays' traversals. On incoherent big-mesh wavefronts that
union approaches the whole tree, capping the kernel near the fully-resident
no-DMA bound (~0.3 M rays/s at 1M tris, BIGMESH.json round5_analysis) no
matter how leaves are fetched. Per-lane independent walks are not
lowerable (Mosaic rejects per-lane dynamic VMEM indexing,
tools/probe_mosaic.py), so this kernel inverts the tile instead:

  * a packet is only WSUB (default 64, vs the packet kernel's 2048)
    rays, one per SUBLANE — the traversal union stays tight (measured
    ~20-30 node visits per ray at 1M tris for any WSUB 8..64);
  * a leaf is K=128 triangles, one per LANE — a leaf visit tests
    WSUB x 128 ray/tri pairs in ~40 dense (WSUB, 128) VPU ops via vector
    ROW reads (`blk_ref[pl.ds(row, 1), :]`, dynamic sublane: probed OK,
    tools/probe_wide.py), not K scalar-broadcast unrolls;
  * K=128 leaves shrink the node table ~64x (16k nodes at 1M tris), so at
    1M triangles the WHOLE table (~64 MiB) is VMEM-resident — the streamed
    kernel's leaf DMA machinery is unnecessary right through the target
    mesh size.

Best-hit state is kept PER LANE (best t/prim/mat/normal of the triangles
that ever occupied that lane slot) in VMEM scratch, so the hot loop does no
cross-lane reductions; one masked row-reduction in the epilogue extracts
each ray's winner. The per-ray prune front (`cur` = row-min of best t,
broadcast) is refreshed only after leaf visits.

Same Möller-Trumbore math, EPS semantics, and detached-winner
plane-equation VJP as the packet kernel (reference traversal:
`/root/reference/src/bvh.rs:131-141`). Layouts come free: `accel/pack.py`
built with max_leaf=128 already lays component c of leaf b at full row
b*12 + c (prim/mat rows at b*2 + {0,1}).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import EPS, INF

LANE = 128
WIDE_K = 128  # tris per leaf; the lane width
# Rays per packet (sublanes). Smaller = tighter traversal unions, more
# grid steps; the 1M-tri sweep (WIDE_SWEEP.json) rises monotonically
# 8 -> 64 on every workload (the serial walk amortizes faster than the
# union penalty grows), so 64 is the default.
WSUB = int(os.environ.get("LLR_WIDE_SUB", "64"))
# VMEM cap for the resident tables (shared philosophy with pallas_bvh:
# v5e has 128 MiB; leave headroom for ray tiles, scratch and XLA temps).
WIDE_VMEM_BYTES = int(os.environ.get("LLR_WIDE_VMEM", str(96 * 1024 * 1024)))


def table_vmem_bytes(bvh) -> int:
    """Chunk-major node table (8 rows / 128 nodes, no lane padding) +
    triangle/prim tables."""
    nchunks = -(-bvh.pk_nodes.shape[0] // LANE)
    return (nchunks * 8 * LANE + bvh.pk_blk.size + bvh.pk_pm.size) * 4


def supported(bvh) -> bool:
    if os.environ.get("LLR_PALLAS", "1") == "0":
        return False
    return (bvh.blk_p0.shape[1] == WIDE_K
            and table_vmem_bytes(bvh) <= WIDE_VMEM_BYTES)


def _kernel(chunk_ref, blk_ref, pm_ref, rays_ref,
            out_t_ref, out_p_ref, bt_ref, bp_ref, col_ref):
    rows = jax.lax.broadcasted_iota(jnp.int32, (WSUB, LANE), 0)

    def rtile(c):
        """(WSUB, LANE) tile: ray r's component c broadcast over lanes."""
        acc = jnp.zeros((WSUB, LANE), jnp.float32)
        for r in range(WSUB):
            acc = jnp.where(rows == r, rays_ref[r, c], acc)
        return acc

    ox, oy, oz = rtile(0), rtile(1), rtile(2)
    dx, dy, dz = rtile(3), rtile(4), rtile(5)
    t0 = rtile(6)
    stop = rtile(7)
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz

    bt_ref[:] = t0
    bp_ref[:] = jnp.full((WSUB, LANE), -1, jnp.int32)

    def row_min(x):
        return jnp.broadcast_to(
            jnp.min(x, axis=1, keepdims=True), (WSUB, LANE)
        )

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)

    n_leaves = blk_ref.shape[0] // 12  # static

    def leaf_test(leaf):
        # Clamp: predicated regions may still issue their loads with the
        # branch-off operand values (leaf = -1 or scalar-read race
        # garbage); an out-of-range VMEM access faults the TPU worker
        # even when the result is discarded.
        leaf = jnp.clip(leaf, 0, n_leaves - 1)
        # One dynamic-sublane BLOCK load for all nine geometry rows
        # (p0/e1/e2 xyz) + one for the prim row. Normal rows (9..11) are
        # never read: shade payloads are recovered by an XLA gather on
        # the winner prim outside.
        blk = blk_ref[pl.ds(leaf * 12, 9), :]  # (9, LANE)

        def brow(c):
            return blk[c:c + 1, :]  # (1, LANE)

        p0x, p0y, p0z = brow(0), brow(1), brow(2)
        e1x, e1y, e1z = brow(3), brow(4), brow(5)
        e2x, e2y, e2z = brow(6), brow(7), brow(8)
        pr = pm_ref[pl.ds(leaf * 2, 1), :]  # (1, LANE) i32

        # Möller-Trumbore, (1,LANE) tri rows x (WSUB,LANE) ray tiles
        # (same math and EPS cut-offs as pallas_bvh._leaf_test).
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
        tri_ok = (
            det_ok
            & (u >= 0.0) & (u <= 1.0)
            & (v >= 0.0) & (u + v <= 1.0)
            & (t >= EPS) & (pr >= 0)
        )
        upd = tri_ok & (t < bt_ref[:])
        bt_ref[:] = jnp.where(upd, t, bt_ref[:])
        bp_ref[:] = jnp.where(upd, pr, bp_ref[:])

    n_chunks = chunk_ref.shape[0] // 8  # static

    def precull(chunk):
        """Slab-test ALL 128 nodes of preorder chunk `chunk` against the
        packet in one dense pass and transpose [descend | miss | leaf]
        into the (128, 8) column scratch, so each walk step is 3 scalar
        reads + a branch — no per-visit vector work or vector->scalar
        sync. The descend flags use the prune front AT CHUNK ENTRY; later
        tightening only costs extra (correct) visits.

        (A fully batched variant — test leaves straight off the desc mask
        with no per-node stepping at all — is algorithmically sound
        [boxes nest, so desc(leaf) alone identifies every walk-visited
        leaf] but every control-flow shape tried for its leaf drain
        faulted the TPU worker or hung XLA-CPU interpret: leaf_test
        inside fori-in-while, flattened two-branch while with SMEM
        carries, nested dynamic-read while chase. See the round-5 notes
        in tools/tpu_runbook.sh before reattempting.)"""
        front = row_min(bt_ref[:])
        nb = chunk_ref[pl.ds(chunk * 8, 8), :]  # (8, LANE) chunk rows
        mnx, mny, mnz = nb[0:1], nb[1:2], nb[2:3]
        mxx, mxy, mxz = nb[3:4], nb[4:5], nb[5:6]
        tax, tbx = (mnx - ox) * ix, (mxx - ox) * ix
        tmin = jnp.minimum(tax, tbx)
        tmax = jnp.maximum(tax, tbx)
        tay, tby = (mny - oy) * iy, (mxy - oy) * iy
        tmin = jnp.maximum(tmin, jnp.minimum(tay, tby))
        tmax = jnp.minimum(tmax, jnp.maximum(tay, tby))
        taz, tbz = (mnz - oz) * iz, (mxz - oz) * iz
        tmin = jnp.maximum(tmin, jnp.minimum(taz, tbz))
        tmax = jnp.minimum(tmax, jnp.maximum(taz, tbz))
        ok = ((tmin <= tmax) & (tmax >= EPS) & (tmin < front)
              & (front > stop))
        desc = jnp.max(jnp.where(ok, 1.0, 0.0), axis=0, keepdims=True)
        pack = jnp.concatenate(
            [desc, nb[6:7], nb[7:8],
             jnp.zeros((5, LANE), jnp.float32)], axis=0
        )  # (8, LANE): [descend | miss | leaf | pad]
        col_ref[:, :] = jnp.swapaxes(pack, 0, 1)  # (LANE, 8)

    def body(carry):
        cur, chunk = carry
        j = jnp.clip(cur - chunk * LANE, 0, LANE - 1)
        descend = col_ref[j, 0] > 0.0
        miss = col_ref[j, 1].astype(jnp.int32)
        leaf = col_ref[j, 2].astype(jnp.int32)
        is_leaf = leaf >= 0

        @pl.when(descend & is_leaf)
        def _():
            leaf_test(leaf)

        nxt = jax.lax.select(descend & jnp.logical_not(is_leaf),
                             cur + 1, miss)
        nchunk = jax.lax.select(
            nxt >= 0, jnp.clip(nxt // LANE, 0, n_chunks - 1), chunk
        )

        @pl.when(nchunk != chunk)
        def _():
            precull(nchunk)

        return nxt, nchunk

    precull(jnp.int32(0))
    jax.lax.while_loop(
        lambda c: c[0] >= 0, body, (jnp.int32(0), jnp.int32(0))
    )

    # Epilogue: one masked reduction per output extracts each ray's winner
    # lane (lowest lane id among the per-ray minima; no winner -> lane 0,
    # whose state is still (t0, -1) -> the documented miss encoding).
    bt = bt_ref[:]
    m = row_min(bt)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (WSUB, LANE), 1)
    lid = row_min(
        jnp.where(bt == m, lanes, LANE).astype(jnp.float32)
    ).astype(jnp.int32)
    onehot = lanes == lid

    def extract(x):
        return jnp.sum(jnp.where(onehot, x, jnp.zeros_like(x)),
                       axis=1, keepdims=True)

    out_t_ref[:, :] = jnp.broadcast_to(m[:, :1], (WSUB, 8))
    out_p_ref[:, :] = jnp.broadcast_to(extract(bp_ref[:]), (WSUB, 8))


def _chunk_table(pk_nodes):
    """(Nn, 8) node rows -> chunk-major (C*8, 128): chunk q row q*8+c
    holds component c ([min3 | max3 | miss | leaf]) of nodes
    q*128..q*128+127 on lanes. Pad nodes are never-hit boxes (+/-1e30)
    with miss = leaf = -1. Derived per call (a reshape+transpose of a
    <1 MiB array — noise next to the walk) so the Bvh container needs no
    new field."""
    nn = pk_nodes.shape[0]
    c = -(-nn // LANE)
    pad_row = jnp.array(
        [1e30, 1e30, 1e30, -1e30, -1e30, -1e30, -1.0, -1.0], jnp.float32
    )
    padded = jnp.concatenate(
        [pk_nodes, jnp.tile(pad_row, (c * LANE - nn, 1))], axis=0
    )
    return jnp.transpose(
        padded.reshape(c, LANE, 8), (0, 2, 1)
    ).reshape(c * 8, LANE)


def _pallas_call(pk_nodes, pk_blk, pk_pm, rays8, *, interpret):
    rows = rays8.shape[0]
    grid = (rows // WSUB,)
    chunk_tab = _chunk_table(pk_nodes)
    table_spec = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    scratch = [
        pltpu.VMEM((WSUB, LANE), jnp.float32),
        pltpu.VMEM((WSUB, LANE), jnp.int32),
        pltpu.VMEM((LANE, 8), jnp.float32),
    ]
    table_bytes = (chunk_tab.size + pk_blk.size + pk_pm.size) * 4
    return pl.pallas_call(
        _kernel,
        grid=grid,
        out_shape=[
            jax.ShapeDtypeStruct((rows, 8), dt)
            for dt in (jnp.float32, jnp.int32)
        ],
        in_specs=[
            table_spec(chunk_tab), table_spec(pk_blk), table_spec(pk_pm),
            pl.BlockSpec((WSUB, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((WSUB, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(2)
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=table_bytes + 4 * 1024 * 1024,
        ),
        interpret=interpret,
    )(chunk_tab, pk_blk, pk_pm, rays8)


@functools.lru_cache(maxsize=None)
def _make_diff_fn(interpret: bool):
    """custom_vjp wrapper; same detached-winner plane-equation backward as
    pallas_bvh (dt/do = -n/(d.n), dt/dd = -t n/(d.n))."""

    @jax.custom_vjp
    def f(o, d, t_init, t_stop, pk_nodes, pk_blk, pk_pm, tri_n):
        return _run(o, d, t_init, t_stop, pk_nodes, pk_blk, pk_pm)

    def _run(o, d, t_init, t_stop, pk_nodes, pk_blk, pk_pm):
        n = o.shape[0]
        pad = (-n) % WSUB
        if pad:
            far = jnp.full((pad, 3), 1e9, o.dtype)
            dpad = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], o.dtype), (pad, 1))
            o = jnp.concatenate([o, far], axis=0)
            d = jnp.concatenate([d, dpad], axis=0)
            t_init = jnp.concatenate(
                [t_init, jnp.full((pad,), INF, t_init.dtype)], axis=0
            )
            t_stop = jnp.concatenate(
                [t_stop, jnp.full((pad,), -INF, t_stop.dtype)], axis=0
            )
        rays8 = jnp.stack(
            [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
             t_init, t_stop],
            axis=1,
        )
        outs = _pallas_call(
            pk_nodes, pk_blk, pk_pm, rays8, interpret=interpret,
        )
        return tuple(x[:n, 0] for x in outs)

    def fwd(o, d, t_init, t_stop, pk_nodes, pk_blk, pk_pm, tri_n):
        outs = _run(o, d, t_init, t_stop, pk_nodes, pk_blk, pk_pm)
        return outs, (d, outs[0], outs[1], tri_n, pk_nodes, pk_blk, pk_pm)

    def bwd(res, g):
        d, t, prim, tri_n, pk_nodes, pk_blk, pk_pm = res
        g_t = g[0]
        won = prim >= 0
        pid = jnp.maximum(prim, 0)
        nrm = jnp.take(tri_n, pid, axis=0)
        dn = jnp.sum(d * nrm, axis=-1)
        safe = won & (jnp.abs(dn) > 1e-20)
        inv = jnp.where(safe, 1.0 / jnp.where(safe, dn, 1.0), 0.0)
        o_bar = (-g_t * inv)[..., None] * nrm
        d_bar = (-g_t * t * inv)[..., None] * nrm
        return (
            o_bar,
            d_bar,
            jnp.zeros_like(g_t),
            jnp.zeros_like(g_t),
            jnp.zeros_like(pk_nodes),
            jnp.zeros_like(pk_blk),
            np.zeros(pk_pm.shape, jax.dtypes.float0),
            jnp.zeros_like(tri_n),
        )

    f.defvjp(fwd, bwd)
    return f


def intersect_tris_wide(o, d, t_init, bvh, tri_n, want_shade: bool = False,
                        interpret: bool = False, t_stop=None,
                        tri_mat=None):
    """Nearest triangle hit strictly closer than `t_init` per lane, via the
    wide-leaf kernel. Same contract as
    `pallas_bvh.intersect_tris_pallas`: returns (t, prim[, mat, nx, ny,
    nz]) with prim = -1 (and t == t_init) where nothing beat t_init.

    Unlike the packet kernel, the shade payload (mat, normal) is NOT
    produced in-kernel: it is one detached XLA gather on the winner prim
    (cheap at wavefront widths, and it keeps the hot loop down to two
    per-lane state tensors). `tri_mat` (T,) i32 is required for
    want_shade; both payloads are piecewise-constant, exactly like the
    packet kernel's non-differentiable outputs."""
    if t_stop is None:
        t_stop = jnp.full(t_init.shape, -INF, t_init.dtype)
    fn = _make_diff_fn(interpret)
    t, prim = fn(o, d, jax.lax.stop_gradient(t_init),
                 jax.lax.stop_gradient(t_stop),
                 bvh.pk_nodes, bvh.pk_blk, bvh.pk_pm, tri_n)
    if not want_shade:
        return t, prim
    won = prim >= 0
    pid = jnp.maximum(prim, 0)
    mat = jnp.where(won, jnp.take(tri_mat, pid, axis=0), -1)
    nrm = jax.lax.stop_gradient(
        jnp.where(won[:, None], jnp.take(tri_n, pid, axis=0), 0.0)
    )
    return t, prim, mat, nrm[:, 0], nrm[:, 1], nrm[:, 2]
