"""Pallas TPU packet-traversal kernel for the threaded (stackless) BVH.

The north-star kernel (BASELINE.json: "stackless BVH traversal ... as Pallas
kernels over SoA ray/hit queues"). Replaces the XLA gather-walk of
`ops/intersect.py:intersect_bvh` on TPU: per-lane node gathers run far below
streaming bandwidth, so instead a *packet* of 1024 rays (one (8,128) f32
tile) walks the tree together behind a single scalar cursor held in the
scalar core:

  * node step: 8 scalar VMEM reads (packed node row) + a dense slab test
    over the whole (8,128) tile; descend if ANY ray hits the box with
    tmin < its current best t (conservative — supersets the per-ray walk,
    so no candidate is ever dropped);
  * leaf: the treelet's K triangles stream through a `fori_loop`, each as
    12 scalar reads broadcast against the full tile (Möller-Trumbore,
    identical math/EPS semantics to `_tri_t_T`), tightening best-t.

Like the reference's traversal (`bvh.rs:131-141`) every box-hit leaf is
fully tested; unlike it there is no per-ray allocation and the test is
SIMD-dense. Packet traversal trades redundant leaf tests (rays that missed
the box still occupy lanes) for the complete elimination of per-lane
gathers — a win on TPU for any remotely coherent wavefront.

Differentiable via `jax.custom_vjp`: the winner is a detached discrete
decision (same stance as the whole renderer, diff/render.py); given the
winner triangle, t's derivative w.r.t. (o, d) is the plane-equation
derivative  dt/do = -n/(d.n),  dt/dd = -t n/(d.n), reconstructed in the
backward pass from one gather over the winner prims. Outputs prim/mat ids
carry no tangents; the winner normal is piecewise constant.

Layouts (packed host-side, `accel/pack.py:_pack_kernel_tables`), shaped by
a hard Mosaic rule established empirically (tools/probe_mosaic.py): scalar
VMEM reads support a DYNAMIC sublane index but the LANE index must be
static. Hence:
  pk_nodes (Nn, 8) f32      : node i -> row i, lane c (STATIC, 0..7),
                              c in [min3 | max3 | miss | leaf]; the row is
                              lane-padded to 128 by Mosaic (16x pad) but
                              the read is a cheap dynamic-sublane load.
  pk_blk   (L*RPB, 128) f32 : block b comps flattened comp-major, comp c
                              tri j -> row b*RPB + (c*K)//128, lane
                              (c*K)%128 + j. j is a PYTHON-unrolled static
                              index (K static), so the lane is static.
  pk_pm    (L*RPM, 128) i32 : [prim(K) | mat(K)] per block likewise
(SMEM would be the natural home for the node table but caps out around
32 KiB on this toolchain — too small for real meshes.)
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

# Sublanes per packet. Round-4 sweep (end-to-end M rays/s): sample.toml
# SUB=8 34.3 / 16 37.4 / 32 34.3 / 64 28.5; welcome-geo 8 25.6 / 16 27.1;
# streamed 60k sorted-coherent 8 1.65 / 16 2.31 — 16 wins everywhere
# (amortizes the scalar node walk over a bigger tile before the union
# penalty bites). Override with LLR_PALLAS_SUB.
SUB = int(os.environ.get("LLR_PALLAS_SUB", "16"))  # sublanes per packet
LANE = 128
PACKET = SUB * LANE

# VMEM budget for fully-RESIDENT tables; past this the leaf blocks stream
# from HBM (double-buffered DMA) while only the node table stays resident.
# v5e has 128 MiB VMEM; the round-5 sweep (tools/bench_resident_cap.py,
# RESIDENT_CAP.json) measured the resident kernel healthy through ~88 MiB
# tables (684k tris), so the cap leaves only ray tiles + XLA headroom.
VMEM_TABLE_BYTES = int(
    os.environ.get("LLR_BVH_VMEM", str(96 * 1024 * 1024))
)
# Node-table budget for the STREAMED variant (v5e has 128 MiB VMEM; leave
# ample headroom for ray tiles, scratch and XLA temps). ~96k nodes.
NODE_VMEM_BYTES = 48 * 1024 * 1024


def node_vmem_bytes(bvh) -> int:
    """pk_nodes is (Nn, 8) but Mosaic lane-pads the last dim to 128."""
    return bvh.pk_nodes.shape[0] * LANE * 4


def table_vmem_bytes(bvh) -> int:
    """VMEM footprint of the fully-resident packed tables."""
    return node_vmem_bytes(bvh) + bvh.pk_blk.size * 4 + bvh.pk_pm.size * 4


def _layout_ok(bvh) -> bool:
    if os.environ.get("LLR_PALLAS", "1") == "0":
        return False
    k = bvh.blk_p0.shape[1]
    return k > 0 and 128 % k == 0


def supported(bvh) -> bool:
    """Whether the resident-table kernel can serve this BVH."""
    return _layout_ok(bvh) and table_vmem_bytes(bvh) <= VMEM_TABLE_BYTES


def supported_streamed(bvh) -> bool:
    """Whether the HBM-streaming kernel can serve this BVH (node table
    resident, leaf treelets DMA'd per visit)."""
    return _layout_ok(bvh) and node_vmem_bytes(bvh) <= NODE_VMEM_BYTES


def on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _leaf_test(bval, pval, mval, rays, out_refs, k: int, want_shade: bool):
    """The statically-unrolled K-triangle Möller-Trumbore over the whole
    (SUB, LANE) tile, shared by the resident and streamed kernels.

    bval(c, j): scalar read of component c (0..11) of treelet triangle j;
    pval(j)/mval(j): prim/mat id reads. All lane offsets inside the
    accessors are compile-time constants (K static) — the one scalar-read
    shape Mosaic accepts.
    """
    ox, oy, oz, dx, dy, dz = rays
    out_t_ref, out_p_ref = out_refs[0], out_refs[1]
    carry = [out_t_ref[:], out_p_ref[:]]
    if want_shade:
        carry.append(out_refs[2][:])
        carry.extend(out_refs[3 + c][:] for c in range(3))
    for j in range(k):
        p0x, p0y, p0z = bval(0, j), bval(1, j), bval(2, j)
        e1x, e1y, e1z = bval(3, j), bval(4, j), bval(5, j)
        e2x, e2y, e2z = bval(6, j), bval(7, j), bval(8, j)
        pr = pval(j)
        # Möller-Trumbore, scalar-tri x vector-rays (same math and EPS
        # cut-offs as `_tri_t_T`, ops/intersect.py).
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
        upd = tri_ok & (t < carry[0])
        new = [
            jnp.where(upd, t, carry[0]),
            jnp.where(upd, pr, carry[1]),
        ]
        if want_shade:
            new.append(jnp.where(upd, mval(j), carry[2]))
            for c in range(3):
                new.append(jnp.where(upd, bval(9 + c, j), carry[3 + c]))
        carry = new
    out_t_ref[:] = carry[0]
    out_p_ref[:] = carry[1]
    if want_shade:
        out_refs[2][:] = carry[2]
        for c in range(3):
            out_refs[3 + c][:] = carry[3 + c]


def run_walk(nodes_ref, blk_ref, pm_ref, rays, t0, stop, out_refs, *,
             k: int, rpb: int, rpm: int, want_shade: bool):
    """Packet union traversal over a (SUB, LANE) ray tile, writing the
    nearest hit into `out_refs` (t, prim[, mat, nx, ny, nz]).

    Shared by the standalone traversal kernel below AND the fused
    bounce-step kernel (ops/pallas_bounce.py), which calls it twice per
    bounce (main ray + NEE shadow ray) with the tables resident in VMEM.
    `stop` is the per-lane occlusion early-stop (-INF for nearest-hit).
    """
    out_t_ref = out_refs[0]
    out_p_ref = out_refs[1]
    ox, oy, oz, dx, dy, dz = rays
    # IEEE inf on zero components — same slab semantics as the XLA walk.
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz

    tile = t0.shape  # (SUB, LANE); the caller's SUB may differ from ours
    out_t_ref[:] = t0
    out_p_ref[:] = jnp.full(tile, -1, jnp.int32)
    if want_shade:
        out_refs[2][:] = jnp.full(tile, -1, jnp.int32)  # mat
        for r in out_refs[3:6]:
            r[:] = jnp.zeros(tile, jnp.float32)  # normal xyz

    def nval(i, c):
        # Dynamic sublane + static lane: the one scalar-read shape Mosaic
        # accepts from VMEM (tools/probe_mosaic.py).
        return nodes_ref[i, c]

    mrow, mlane = divmod(k, LANE)  # mat offset inside pk_pm (static)

    def body(cur):
        mnx, mny, mnz = nval(cur, 0), nval(cur, 1), nval(cur, 2)
        mxx, mxy, mxz = nval(cur, 3), nval(cur, 4), nval(cur, 5)
        miss = nval(cur, 6).astype(jnp.int32)
        leaf = nval(cur, 7).astype(jnp.int32)

        tax, tbx = (mnx - ox) * ix, (mxx - ox) * ix
        tmin = jnp.minimum(tax, tbx)
        tmax = jnp.maximum(tax, tbx)
        tay, tby = (mny - oy) * iy, (mxy - oy) * iy
        tmin = jnp.maximum(tmin, jnp.minimum(tay, tby))
        tmax = jnp.minimum(tmax, jnp.maximum(tay, tby))
        taz, tbz = (mnz - oz) * iz, (mxz - oz) * iz
        tmin = jnp.maximum(tmin, jnp.minimum(taz, tbz))
        tmax = jnp.minimum(tmax, jnp.maximum(taz, tbz))
        cur_t = out_t_ref[:]
        ok = ((tmin <= tmax) & (tmax >= EPS) & (tmin < cur_t)
              & (cur_t > stop))
        anyhit = jnp.any(ok)
        is_leaf = leaf >= 0

        @pl.when(anyhit & is_leaf)
        def _():
            bbase = leaf * rpb
            pbase = leaf * rpm

            # PYTHON-unrolled triangle loop (K static): every lane offset
            # is a compile-time constant, which is what lets Mosaic lower
            # the scalar reads (dynamic lane indices are rejected).
            def bval(c, j):
                return blk_ref[bbase + (c * k) // LANE, (c * k) % LANE + j]

            def pval(j):
                return pm_ref[pbase + (j // LANE), j % LANE]

            def mval(j):
                return pm_ref[pbase + mrow + (mlane + j) // LANE,
                              (mlane + j) % LANE]

            _leaf_test(bval, pval, mval, (ox, oy, oz, dx, dy, dz),
                       out_refs, k, want_shade)

        return jax.lax.select(anyhit & jnp.logical_not(is_leaf), cur + 1, miss)

    jax.lax.while_loop(lambda cur: cur >= 0, body, jnp.int32(0))


def _kernel(nodes_ref, blk_ref, pm_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref,
            stop_ref, *out_refs, k: int, rpb: int, rpm: int,
            want_shade: bool):
    run_walk(
        nodes_ref, blk_ref, pm_ref,
        (ox_ref[:], oy_ref[:], oz_ref[:], dx_ref[:], dy_ref[:], dz_ref[:]),
        t0_ref[:], stop_ref[:], out_refs,
        k=k, rpb=rpb, rpm=rpm, want_shade=want_shade,
    )


def _kernel_streamed(nodes_ref, blk_hbm, pm_hbm,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t0_ref,
                     stop_ref, *rest, k: int, rpb: int, rpm: int,
                     want_shade: bool):
    """HBM-streaming packet traversal: node table resident in VMEM, leaf
    treelet blocks DMA'd from HBM on visit.

    Scales to meshes whose triangle tables exceed VMEM (the resident
    kernel's 12 MiB cap ~ 200k tris): only the node table (8 f32/node)
    must fit. The DMA is software-pipelined one leaf deep — when leaf B is
    discovered, leaf A's in-flight copy is waited on and tested, then B's
    copy starts and overlaps the subsequent node walk. One copy in flight
    + test-before-restart means a single scratch buffer is safe, and every
    scratch index is fully static (even the dynamic-sublane trick of the
    resident kernel is unnecessary).
    """
    n_out = 6 if want_shade else 2
    out_refs = rest[:n_out]
    blk_buf, pm_buf, sem_b, sem_p = rest[n_out:]
    out_t_ref, out_p_ref = out_refs[0], out_refs[1]
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    stop = stop_ref[:]
    ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz

    out_t_ref[:] = t0_ref[:]
    out_p_ref[:] = jnp.full((SUB, LANE), -1, jnp.int32)
    if want_shade:
        out_refs[2][:] = jnp.full((SUB, LANE), -1, jnp.int32)
        for r in out_refs[3:6]:
            r[:] = jnp.zeros((SUB, LANE), jnp.float32)

    def nval(i, c):
        return nodes_ref[i, c]

    mrow, mlane = divmod(k, LANE)

    # DMA sublane extents must be 1 or a multiple of 8 on this backend
    # (anything else faults the TPU worker — probed empirically); offsets
    # may be unaligned. Copy an 8-rounded window from the block's exact
    # offset; the tables carry 8 rows of tail padding (accel/pack.py).
    rpb8 = (rpb + 7) // 8 * 8
    rpm8 = (rpm + 7) // 8 * 8

    def start_dma(leaf):
        pltpu.make_async_copy(
            blk_hbm.at[pl.ds(leaf * rpb, rpb8)], blk_buf, sem_b
        ).start()
        pltpu.make_async_copy(
            pm_hbm.at[pl.ds(leaf * rpm, rpm8)], pm_buf, sem_p
        ).start()

    def wait_dma():
        # Reconstructed descriptors: wait() only needs the semaphore and
        # the copy size, which are identical for every leaf.
        pltpu.make_async_copy(
            blk_hbm.at[pl.ds(0, rpb8)], blk_buf, sem_b
        ).wait()
        pltpu.make_async_copy(
            pm_hbm.at[pl.ds(0, rpm8)], pm_buf, sem_p
        ).wait()

    def test_buf():
        def bval(c, j):
            return blk_buf[(c * k) // LANE, (c * k) % LANE + j]

        def pval(j):
            return pm_buf[j // LANE, j % LANE]

        def mval(j):
            return pm_buf[mrow + (mlane + j) // LANE, (mlane + j) % LANE]

        _leaf_test(bval, pval, mval, (ox, oy, oz, dx, dy, dz),
                   out_refs, k, want_shade)

    def body(carry):
        cur, pending = carry
        mnx, mny, mnz = nval(cur, 0), nval(cur, 1), nval(cur, 2)
        mxx, mxy, mxz = nval(cur, 3), nval(cur, 4), nval(cur, 5)
        miss = nval(cur, 6).astype(jnp.int32)
        leaf = nval(cur, 7).astype(jnp.int32)

        tax, tbx = (mnx - ox) * ix, (mxx - ox) * ix
        tmin = jnp.minimum(tax, tbx)
        tmax = jnp.maximum(tax, tbx)
        tay, tby = (mny - oy) * iy, (mxy - oy) * iy
        tmin = jnp.maximum(tmin, jnp.minimum(tay, tby))
        tmax = jnp.minimum(tmax, jnp.maximum(tay, tby))
        taz, tbz = (mnz - oz) * iz, (mxz - oz) * iz
        tmin = jnp.maximum(tmin, jnp.minimum(taz, tbz))
        tmax = jnp.minimum(tmax, jnp.maximum(taz, tbz))
        cur_t = out_t_ref[:]
        ok = ((tmin <= tmax) & (tmax >= EPS) & (tmin < cur_t)
              & (cur_t > stop))
        anyhit = jnp.any(ok)
        is_leaf = leaf >= 0
        found = anyhit & is_leaf

        # Flush the in-flight treelet before its buffer is reused.
        @pl.when(found & (pending >= 0))
        def _():
            wait_dma()
            test_buf()

        @pl.when(found)
        def _():
            start_dma(leaf)

        pending = jnp.where(found, leaf, pending)
        cur = jax.lax.select(anyhit & jnp.logical_not(is_leaf), cur + 1, miss)
        return cur, pending

    _, pending = jax.lax.while_loop(
        lambda c: c[0] >= 0, body, (jnp.int32(0), jnp.int32(-1))
    )

    @pl.when(pending >= 0)
    def _():
        wait_dma()
        test_buf()


def _pallas_call(pk_nodes, pk_blk, pk_pm, rays2d, t0_2d, stop_2d, *, k, rpb,
                 rpm, want_shade, interpret, streamed=False):
    rows = t0_2d.shape[0]
    grid = (rows // SUB,)
    table_spec = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    ray_spec = pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    n_out = 6 if want_shade else 2
    out_dtypes = [jnp.float32, jnp.int32, jnp.int32,
                  jnp.float32, jnp.float32, jnp.float32][:n_out]
    if streamed:
        kernel = functools.partial(
            _kernel_streamed, k=k, rpb=rpb, rpm=rpm, want_shade=want_shade
        )
        # Explicit HBM (NOT pl.ANY): sliced DMA from an ANY-space input
        # faults this backend's TPU worker; from HBM it works.
        blk_spec = pm_spec = pl.BlockSpec(memory_space=pltpu.HBM)
        scratch = [
            pltpu.VMEM(((rpb + 7) // 8 * 8, LANE), jnp.float32),
            pltpu.VMEM(((rpm + 7) // 8 * 8, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ]
        vmem_limit = node_vmem_bytes_arr(pk_nodes) + 8 * 1024 * 1024
    else:
        kernel = functools.partial(
            _kernel, k=k, rpb=rpb, rpm=rpm, want_shade=want_shade
        )
        blk_spec, pm_spec = table_spec(pk_blk), table_spec(pk_pm)
        scratch = []
        # Actual table footprint, not the admission cap: a small scene must
        # not reserve the whole budget.
        table_bytes = (
            node_vmem_bytes_arr(pk_nodes)
            + pk_blk.size * 4 + pk_pm.size * 4
        )
        vmem_limit = table_bytes + 4 * 1024 * 1024
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANE), dt) for dt in out_dtypes
        ],
        in_specs=[table_spec(pk_nodes), blk_spec, pm_spec] + [ray_spec] * 8,
        out_specs=[
            pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_out)
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(pk_nodes, pk_blk, pk_pm, *rays2d, t0_2d, stop_2d)


def node_vmem_bytes_arr(pk_nodes) -> int:
    return pk_nodes.shape[0] * LANE * 4


@functools.lru_cache(maxsize=None)
def _make_diff_fn(k: int, rpb: int, rpm: int, want_shade: bool,
                  interpret: bool, streamed: bool = False):
    """custom_vjp-wrapped kernel call for a given static configuration."""

    @jax.custom_vjp
    def f(o, d, t_init, t_stop, pk_nodes, pk_blk, pk_pm, tri_n):
        return _run(o, d, t_init, t_stop, pk_nodes, pk_blk, pk_pm)

    def _run(o, d, t_init, t_stop, pk_nodes, pk_blk, pk_pm):
        n = o.shape[0]
        pad = (-n) % PACKET
        if pad:
            # Padding rays start far away pointing at +z with t_init=INF;
            # the root box is behind them (tmax < EPS) so they walk out
            # after the root test.
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
        rays2d = tuple(
            a[:, c].reshape(-1, LANE) for a in (o, d) for c in range(3)
        )
        t0_2d = t_init.reshape(-1, LANE)
        stop_2d = t_stop.reshape(-1, LANE)
        outs = _pallas_call(
            pk_nodes, pk_blk, pk_pm, rays2d, t0_2d, stop_2d,
            k=k, rpb=rpb, rpm=rpm, want_shade=want_shade,
            interpret=interpret, streamed=streamed,
        )
        outs = [x.reshape(-1)[: n] for x in outs]
        return tuple(outs)


    def fwd(o, d, t_init, t_stop, pk_nodes, pk_blk, pk_pm, tri_n):
        outs = _run(o, d, t_init, t_stop, pk_nodes, pk_blk, pk_pm)
        t, prim = outs[0], outs[1]
        return outs, (d, t, prim, tri_n, pk_nodes, pk_blk, pk_pm)

    def bwd(res, g):
        d, t, prim, tri_n, pk_nodes, pk_blk, pk_pm = res
        g_t = g[0]
        # Plane-equation derivative at the (detached) winner triangle:
        # t = ((p0 - o) . n) / (d . n)  =>  dt/do = -n/(d.n),
        # dt/dd = -t n/(d.n). Zero on miss lanes. The prim/mat/normal
        # outputs are piecewise constant — their cotangents are dropped.
        won = prim >= 0
        pid = jnp.maximum(prim, 0)
        nrm = jnp.take(tri_n, pid, axis=0)  # (N, 3)
        dn = jnp.sum(d * nrm, axis=-1)
        safe = won & (jnp.abs(dn) > 1e-20)
        inv = jnp.where(safe, 1.0 / jnp.where(safe, dn, 1.0), 0.0)
        o_bar = (-g_t * inv)[..., None] * nrm
        d_bar = (-g_t * t * inv)[..., None] * nrm
        return (
            o_bar,
            d_bar,
            jnp.zeros_like(g_t),  # t_init (detached by construction)
            jnp.zeros_like(g_t),  # t_stop (detached by construction)
            jnp.zeros_like(pk_nodes),
            jnp.zeros_like(pk_blk),
            np.zeros(pk_pm.shape, jax.dtypes.float0),  # int32 -> float0
            jnp.zeros_like(tri_n),
        )

    f.defvjp(fwd, bwd)
    return f


def intersect_tris_pallas(o, d, t_init, bvh, tri_n, want_shade: bool = False,
                          interpret: bool = False,
                          streamed: bool | None = None, t_stop=None):
    """Nearest triangle hit strictly closer than `t_init` per lane.

    o, d: (N, 3); t_init: (N,) prune threshold (e.g. sphere pre-pass t or
    INF). Returns (t, prim[, mat, nx, ny, nz]) with prim = -1 where no
    triangle beat t_init (then t == t_init). `tri_n` (T,3) face normals
    feed the backward pass only. `streamed=None` auto-selects: resident
    tables when they fit VMEM, HBM-streaming otherwise. `t_stop` (N,)
    stops a lane once its best t falls below it (occlusion queries; see
    intersect_bvh).
    """
    if streamed is None:
        streamed = not supported(bvh)
    if t_stop is None:
        t_stop = jnp.full(t_init.shape, -INF, t_init.dtype)
    k = bvh.blk_p0.shape[1]
    rpb = (12 * k + 127) // 128
    rpm = (2 * k + 127) // 128
    fn = _make_diff_fn(k, rpb, rpm, want_shade, interpret, streamed)
    return fn(o, d, jax.lax.stop_gradient(t_init),
              jax.lax.stop_gradient(t_stop),
              bvh.pk_nodes, bvh.pk_blk, bvh.pk_pm, tri_n)
