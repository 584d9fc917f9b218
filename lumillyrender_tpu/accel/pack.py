"""Treelet packing: SAH range-leaves -> fixed-K contiguous device blocks.

Host-side. Converts `sah.build_ranges` output over a triangle table into the
`scene.data.Bvh` array set (numpy): node arrays plus (L, K, 3) triangle
blocks with -1-padded original prim ids. Degenerate zero triangles pad block
tails (a zero triangle's MT determinant is 0 -> always missed).
"""

from __future__ import annotations

import numpy as np

from . import sah

# Treelet (max-leaf) size — measured sweep on the 82k-tri mesh (TPU,
# tools/bench_pallas.py, 256k rays, Pallas packet kernel M rays/s
# coherent/incoherent): K=64 8.7/5.0, K=32 8.1/8.2, K=16 7.6/9.1. K=32 is
# the best all-round point: the packet kernel pays K triangle tests per
# leaf visit for EVERY lane (redundant work grows with K on incoherent
# wavefronts), while smaller K deepens the scalar node walk. The XLA
# gather-walk prefers larger K (dense (n, K) block tests amortize gathers)
# but tops out ~2 M rays/s either way. Override with LLR_TREELET_K.
import os

TREELET_K = int(os.environ.get("LLR_TREELET_K", "32"))

# Triangle count past which the scene compiler builds 128-wide leaves and
# traversal routes to the wide-leaf kernel (ops/pallas_bvh_wide.py): the
# K=32 packet kernel's resident tables outgrow VMEM around ~650k tris
# (RESIDENT_CAP.json measured healthy through 684k) and its HBM-streaming
# fallback is slower than the fully-resident wide kernel at 1M tris
# (BIGMESH.json).
WIDE_MIN_TRIS = int(os.environ.get("LLR_WIDE_MIN_TRIS", "650000"))


def _pack_kernel_tables(node_min, node_max, node_miss, node_leaf,
                        blk_p0, blk_e1, blk_e2, blk_n, blk_prim, blk_mat):
    """Pallas-kernel layouts (see ops/pallas_bvh.py for the access scheme).

    * pk_nodes (Nn, 8) f32 — node i at row i: [min3 | max3 | miss | leaf],
      links exact as f32. Lane index is STATIC (0..7) and the sublane index
      dynamic — the only scalar-read shape Mosaic accepts from VMEM.
    * pk_blk (L*RPB, 128) f32 — block b's 12 components (p0,e1,e2,n xyz),
      each K wide, flattened comp-major into RPB=ceil(12K/128) rows.
    * pk_pm (L*RPM, 128) i32 — [prim(K) | mat(K)] per block likewise.

    Requires K | 128 so every component stays within one packed row at a
    static lane offset; otherwise emits empty tables (kernel path disabled).
    """
    k = blk_p0.shape[1]
    if k <= 0 or 128 % k != 0:
        # Degenerate tables still honor the streamed kernel's DMA invariant
        # (every window read is a sublane extent rounded up to 8): 9 rows
        # covers an rpb8=8 window from offset 0. Unreachable today (nt==0
        # short-circuits in intersect_bvh) but latent-OOB-proof.
        return dict(
            pk_nodes=np.zeros((1, 8), np.float32),
            pk_blk=np.zeros((9, 128), np.float32),
            pk_pm=np.full((9, 128), -1, np.int32),
        )
    pk_nodes = np.concatenate(
        [
            node_min.astype(np.float32),
            node_max.astype(np.float32),
            node_miss.astype(np.float32)[:, None],
            node_leaf.astype(np.float32)[:, None],
        ],
        axis=1,
    )

    l = blk_p0.shape[0]
    comps = np.concatenate(
        [
            np.swapaxes(blk_p0, 1, 2),
            np.swapaxes(blk_e1, 1, 2),
            np.swapaxes(blk_e2, 1, 2),
            np.swapaxes(blk_n, 1, 2),
        ],
        axis=1,
    )  # (L, 12, K)
    rpb = (12 * k + 127) // 128
    pk_blk = np.zeros((l, rpb * 128), np.float32)
    pk_blk[:, : 12 * k] = comps.reshape(l, 12 * k)
    pk_blk = pk_blk.reshape(l * rpb, 128).astype(np.float32)

    rpm = (2 * k + 127) // 128
    pk_pm = np.full((l, rpm * 128), -1, np.int32)
    pk_pm[:, :k] = blk_prim
    pk_pm[:, k : 2 * k] = blk_mat
    pk_pm = pk_pm.reshape(l * rpm, 128)
    # Tail padding for the HBM-streaming kernel: its per-leaf DMA copies a
    # sublane extent rounded UP to a multiple of 8 (the only extents the
    # DMA engine accepts besides 1; offsets may be unaligned), so the last
    # block's window may read up to 7 rows past its end.
    pk_blk = np.concatenate(
        [pk_blk, np.zeros((8, 128), np.float32)], axis=0
    )
    pk_pm = np.concatenate([pk_pm, np.full((8, 128), -1, np.int32)], axis=0)
    return dict(pk_nodes=pk_nodes, pk_blk=pk_blk, pk_pm=pk_pm)


def build_tri_bvh(tri_p0, tri_e1, tri_e2, tri_n=None, tri_mat=None,
                  max_leaf: int | None = None):
    """Returns dict of numpy arrays matching scene.data.Bvh fields.

    `tri_n` / `tri_mat` fill the per-block shade payload (`blk_n`,
    `blk_mat`) so traversal can hand back the winner's normal and material
    row without any post-hoc gather into the global tables; omitted (tests)
    they default to recomputed face normals / material row 0.
    """
    if max_leaf is None:
        max_leaf = TREELET_K
    t = tri_p0.shape[0]
    k = max_leaf
    if tri_n is None and t:
        n = np.cross(tri_e1, tri_e2)
        ln = np.linalg.norm(n, axis=1, keepdims=True)
        tri_n = n / np.where(ln > 0, ln, 1.0)
    if tri_mat is None:
        tri_mat = np.zeros(t, np.int32)
    if t == 0:
        out = dict(
            node_min=np.zeros((1, 3), np.float32),
            node_max=np.zeros((1, 3), np.float32),
            node_miss=np.full((1,), -1, np.int32),
            node_leaf=np.full((1,), -1, np.int32),
            blk_p0=np.zeros((1, k, 3), np.float32),
            blk_e1=np.zeros((1, k, 3), np.float32),
            blk_e2=np.zeros((1, k, 3), np.float32),
            blk_n=np.zeros((1, k, 3), np.float32),
            blk_prim=np.full((1, k), -1, np.int32),
            blk_mat=np.full((1, k), -1, np.int32),
        )
        out.update(
            _pack_kernel_tables(
                out["node_min"], out["node_max"], out["node_miss"],
                out["node_leaf"], out["blk_p0"], out["blk_e1"],
                out["blk_e2"], out["blk_n"], out["blk_prim"], out["blk_mat"],
            )
        )
        return out

    p1 = tri_p0 + tri_e1
    p2 = tri_p0 + tri_e2
    mins = np.minimum(np.minimum(tri_p0, p1), p2)
    maxs = np.maximum(np.maximum(tri_p0, p1), p2)
    centers = (mins + maxs) / 2.0

    rb = _build_ranges(mins, maxs, centers, max_leaf)

    leaves = np.nonzero(rb.leaf_start >= 0)[0]
    n_blocks = leaves.shape[0]
    blk_p0 = np.zeros((n_blocks, k, 3), np.float32)
    blk_e1 = np.zeros((n_blocks, k, 3), np.float32)
    blk_e2 = np.zeros((n_blocks, k, 3), np.float32)
    blk_n = np.zeros((n_blocks, k, 3), np.float32)
    blk_prim = np.full((n_blocks, k), -1, np.int32)
    blk_mat = np.full((n_blocks, k), -1, np.int32)
    node_leaf = np.full(rb.node_miss.shape[0], -1, np.int32)
    for b, node in enumerate(leaves):
        lo = rb.leaf_start[node]
        n = rb.leaf_count[node]
        ids = rb.perm[lo : lo + n]
        blk_p0[b, :n] = tri_p0[ids]
        blk_e1[b, :n] = tri_e1[ids]
        blk_e2[b, :n] = tri_e2[ids]
        blk_n[b, :n] = tri_n[ids]
        blk_prim[b, :n] = ids
        blk_mat[b, :n] = tri_mat[ids]
        node_leaf[node] = b

    out = dict(
        node_min=rb.node_min,
        node_max=rb.node_max,
        node_miss=rb.node_miss,
        node_leaf=node_leaf,
        blk_p0=blk_p0,
        blk_e1=blk_e1,
        blk_e2=blk_e2,
        blk_n=blk_n,
        blk_prim=blk_prim,
        blk_mat=blk_mat,
    )
    out.update(
        _pack_kernel_tables(
            rb.node_min, rb.node_max, rb.node_miss, node_leaf,
            blk_p0, blk_e1, blk_e2, blk_n, blk_prim, blk_mat,
        )
    )
    return out


def _build_ranges(mins, maxs, centers, max_leaf):
    """Prefer the native builder, fall back to numpy."""
    try:
        from . import native

        return native.build_ranges(mins, maxs, centers, max_leaf)
    except Exception:
        return sah.build_ranges(mins, maxs, centers, max_leaf)
