"""Host-side SAH BVH builder producing a flattened, threaded (stackless) tree.

Parity: the split criterion reproduces the reference builder exactly
(`bvh.rs:69-127`): at every node, for each of the 3 axes, sort leaf AABBs by
centroid, sweep prefix/suffix merged-AABB surface areas and evaluate the full
SAH cost ``T = 2*T_aabb + (A(S1)*N(S1) + A(S2)*N(S2)) * T_tri / A(S)`` with
``t_aabb = 1, t_tri = 2`` at every split index; the minimum (first-minimum
tie-break, axis-major) wins. Leaves hold exactly one primitive
(`bvh.rs:76-78`).

Unlike the reference's pointer tree with collect-all-candidates traversal
(`bvh.rs:131-141`, which allocates a Vec per ray), we emit the tree as flat
arrays in DFS preorder with *miss links*, so device traversal is a single
cursor loop with no stack: on AABB hit at an inner node the cursor advances
to ``i+1`` (its left child); on miss — or after intersecting a leaf — it
jumps to ``miss[i]``; ``-1`` terminates. Identical nearest-hit results, but
ordered, t-max-prunable and vectorizable.

numpy only (runs once at scene compile time). A C++ builder with the same
output layout lives in `native/`; this is the reference implementation and
test oracle for it.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

T_AABB = 1.0
T_TRI = 2.0


@dataclass
class FlatBvh:
    node_min: np.ndarray  # (N, 3) f32
    node_max: np.ndarray  # (N, 3) f32
    node_miss: np.ndarray  # (N,) i32
    node_leaf: np.ndarray  # (N,) i32 prim id or -1


def _surface_area(mins: np.ndarray, maxs: np.ndarray) -> np.ndarray:
    side = np.abs(maxs - mins)
    return 2.0 * (
        side[..., 0] * side[..., 1]
        + side[..., 1] * side[..., 2]
        + side[..., 2] * side[..., 0]
    )


def _choose_split(mins, maxs, centers):
    """Return (order, split_index, parent_min, parent_max) for one node.

    `order` is the permutation sorted along the winning axis; the split is
    order[:split_index] / order[split_index:]. Mirrors `bvh.rs:82-117`.
    """
    n = mins.shape[0]
    best = None  # (cost, axis, index, order)
    parent_min = parent_max = None
    for axis in range(3):
        order = np.argsort(centers[:, axis], kind="stable")
        smin, smax = mins[order], maxs[order]
        # prefix: union of leaves [0..=i]
        pre_min = np.minimum.accumulate(smin, axis=0)
        pre_max = np.maximum.accumulate(smax, axis=0)
        s1_a = _surface_area(pre_min, pre_max)  # (n,)
        # suffix: union of leaves [i..n)
        suf_min = np.minimum.accumulate(smin[::-1], axis=0)[::-1]
        suf_max = np.maximum.accumulate(smax[::-1], axis=0)[::-1]
        s2_a = _surface_area(suf_min, suf_max)  # (n,)
        parent_min, parent_max = pre_min[-1], pre_max[-1]
        s_a = s1_a[-1]
        counts1 = np.arange(1, n, dtype=np.float64)
        counts2 = np.arange(n - 1, 0, -1, dtype=np.float64)
        cost = 2.0 * T_AABB + (s1_a[:-1] * counts1 + s2_a[1:] * counts2) * T_TRI / s_a
        i = int(np.argmin(cost))  # first minimum, like Rust min_by_key
        c = float(cost[i])
        if best is None or c < best[0]:
            best = (c, axis, i + 1, order)
    _, _, split_index, order = best
    return order, split_index, parent_min, parent_max


def build(mins: np.ndarray, maxs: np.ndarray, centers: np.ndarray) -> FlatBvh:
    """Build a threaded BVH over primitive AABBs.

    mins/maxs/centers: (P, 3). centers must be AABB centers ((min+max)/2),
    matching the reference's sort key (`bvh.rs:85-87`).
    """
    p = mins.shape[0]
    if p == 0:
        return FlatBvh(
            node_min=np.zeros((1, 3), np.float32),
            node_max=np.zeros((1, 3), np.float32),
            node_miss=np.full((1,), -1, np.int32),
            node_leaf=np.full((1,), -1, np.int32),
        )
    mins = np.asarray(mins, dtype=np.float64)
    maxs = np.asarray(maxs, dtype=np.float64)
    centers = np.asarray(centers, dtype=np.float64)

    n_nodes = 2 * p - 1
    node_min = np.empty((n_nodes, 3), np.float64)
    node_max = np.empty((n_nodes, 3), np.float64)
    node_miss = np.empty((n_nodes,), np.int32)
    node_leaf = np.full((n_nodes,), -1, np.int32)

    # Explicit DFS stack of (prim_ids, miss_link); preorder node emission.
    next_index = 0
    stack: list[tuple[np.ndarray, int]] = [(np.arange(p), -1)]
    while stack:
        ids, miss = stack.pop()
        idx = next_index
        next_index += 1
        node_miss[idx] = miss
        if ids.shape[0] == 1:
            pid = int(ids[0])
            node_leaf[idx] = pid
            node_min[idx] = mins[pid]
            node_max[idx] = maxs[pid]
            continue
        order, split, pmin, pmax = _choose_split(mins[ids], maxs[ids], centers[ids])
        node_min[idx] = pmin
        node_max[idx] = pmax
        sorted_ids = ids[order]
        left, right = sorted_ids[:split], sorted_ids[split:]
        right_index = idx + 1 + (2 * left.shape[0] - 1)
        # Push right first so left is emitted immediately after its parent.
        stack.append((right, miss))
        stack.append((left, right_index))

    assert next_index == n_nodes
    return FlatBvh(
        node_min=node_min.astype(np.float32),
        node_max=node_max.astype(np.float32),
        node_miss=node_miss,
        node_leaf=node_leaf,
    )


@dataclass
class RangeBvh:
    """Flattened threaded BVH whose leaves are primitive RANGES (treelets).

    Leaves cover `perm[leaf_start[i] : leaf_start[i]+leaf_count[i]]`;
    `perm` is the SAH-sorted primitive permutation. The device layout packs
    each leaf range into a fixed-K block (see scene/compiler.py) so a leaf
    visit is one contiguous block gather + K dense intersections — the
    TPU-friendly alternative to per-prim leaves.
    """

    node_min: np.ndarray  # (N, 3) f32
    node_max: np.ndarray  # (N, 3) f32
    node_miss: np.ndarray  # (N,) i32
    leaf_start: np.ndarray  # (N,) i32, -1 for inner nodes
    leaf_count: np.ndarray  # (N,) i32, 0 for inner nodes
    perm: np.ndarray  # (P,) i32


def build_ranges(mins, maxs, centers, max_leaf: int = 16) -> RangeBvh:
    """SAH build that stops splitting at `max_leaf` prims per leaf.

    Same split criterion as `build` (reference cost model); only the leaf
    threshold differs (the reference always splits to 1, `bvh.rs:76-78` —
    treelets are a TPU performance layout, not a behavior change: traversal
    output is identical).
    """
    p = mins.shape[0]
    if p == 0:
        return RangeBvh(
            node_min=np.zeros((1, 3), np.float32),
            node_max=np.zeros((1, 3), np.float32),
            node_miss=np.full((1,), -1, np.int32),
            leaf_start=np.zeros((1,), np.int32),
            leaf_count=np.zeros((1,), np.int32),
            perm=np.zeros((0,), np.int32),
        )
    mins = np.asarray(mins, dtype=np.float64)
    maxs = np.asarray(maxs, dtype=np.float64)
    centers = np.asarray(centers, dtype=np.float64)

    node_min, node_max, node_miss = [], [], []
    leaf_start, leaf_count = [], []
    perm = np.arange(p)

    # (lo, hi, miss, resolved) stack over slices of `perm`; two-pass since
    # subtree sizes are data-dependent with range leaves: we patch miss
    # links with a placeholder scheme using per-node subtree extents.
    # Simpler: recursive emission with explicit stack and a second pass to
    # fix miss links via subtree sizes recorded during emission.
    sizes: list[int] = []  # subtree node count per emitted node

    def emit(lo: int, hi: int) -> int:
        idx = len(node_min)
        n = hi - lo
        if n <= max_leaf:
            pm = mins[perm[lo:hi]]
            px = maxs[perm[lo:hi]]
            node_min.append(pm.min(axis=0))
            node_max.append(px.max(axis=0))
            node_miss.append(-1)  # fixed up below
            leaf_start.append(lo)
            leaf_count.append(n)
            sizes.append(1)
            return idx
        order, split, pmin, pmax = _choose_split(
            mins[perm[lo:hi]], maxs[perm[lo:hi]], centers[perm[lo:hi]]
        )
        perm[lo:hi] = perm[lo:hi][order]
        node_min.append(pmin)
        node_max.append(pmax)
        node_miss.append(-1)
        leaf_start.append(-1)
        leaf_count.append(0)
        sizes.append(0)  # placeholder
        left = emit(lo, lo + split)
        right = emit(lo + split, hi)
        sizes[idx] = 1 + sizes[left] + sizes[right]
        return idx

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 4 * p + 1000))
    try:
        emit(0, p)
    finally:
        sys.setrecursionlimit(old_limit)

    n_nodes = len(node_min)
    miss = np.full(n_nodes, -1, np.int32)
    # miss[i] = next node after i's subtree, or parent's miss; computed by a
    # DFS walk using subtree sizes.
    stack = [(0, -1)]
    while stack:
        i, m = stack.pop()
        miss[i] = m
        if leaf_start[i] < 0:  # inner: children at i+1 and i+1+sizes[i+1]
            left = i + 1
            right = left + sizes[left]
            stack.append((right, m))
            stack.append((left, right))

    return RangeBvh(
        node_min=np.asarray(node_min, np.float32),
        node_max=np.asarray(node_max, np.float32),
        node_miss=miss,
        leaf_start=np.asarray(leaf_start, np.int32),
        leaf_count=np.asarray(leaf_count, np.int32),
        perm=perm.astype(np.int32),
    )


def prim_aabbs(tri_p0, tri_e1, tri_e2, sph_c, sph_r):
    """AABBs for the unified prim table (tris then spheres).

    Triangle AABB from its three vertices (`triangle.rs:102-118`); sphere
    AABB center±r (`sphere.rs:31-38`). Centers are (min+max)/2.
    """
    parts_min, parts_max = [], []
    if tri_p0.shape[0]:
        p0 = tri_p0
        p1 = tri_p0 + tri_e1
        p2 = tri_p0 + tri_e2
        parts_min.append(np.minimum(np.minimum(p0, p1), p2))
        parts_max.append(np.maximum(np.maximum(p0, p1), p2))
    if sph_c.shape[0]:
        r = sph_r[:, None]
        parts_min.append(sph_c - r)
        parts_max.append(sph_c + r)
    if not parts_min:
        z = np.zeros((0, 3))
        return z, z, z
    mins = np.concatenate(parts_min, axis=0)
    maxs = np.concatenate(parts_max, axis=0)
    return mins, maxs, (mins + maxs) / 2.0
