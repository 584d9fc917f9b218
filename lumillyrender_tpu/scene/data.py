"""Device-side scene representation: SoA arrays + static render settings.

This is the TPU-native replacement for the reference's trait-object scene
graph (`src/shape.rs`, `src/objects.rs`, `src/intersection.rs`): geometry,
materials, lights, BVH and sky all become flat arrays a wavefront kernel can
gather from, and everything that selects a code path (camera kind, sky kind,
integrator, sizes) is static metadata so `jit` sees fixed shapes/branches.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import numpy as np

# Material type ids (order matches reference material modules).
MAT_LAMBERT = 0
MAT_PHONG = 1
MAT_BLINN_PHONG = 2
MAT_GGX = 3
MAT_REFRACTION = 4

SKY_UNIFORM = 0
SKY_IBL = 1
SKY_SIMPLE = 2  # reference dead code (sky.rs:23-33), reachable here

CAM_IDEAL_PINHOLE = 0
CAM_THIN_LENS = 1
CAM_OMNIDIRECTIONAL = 2
# 'Realistic pinhole' (camera.rs:199-337): implemented but unreachable from
# TOML in the reference (description.rs:50-54); reachable here as `pinhole`.
CAM_PINHOLE = 3


@dataclass
class MaterialTable:
    """Differentiable material parameter table.

    Replaces the reference's `Material` trait objects (`material/traits.rs`):
    one row per material, `type_id` selects the BSDF branch in the vectorized
    shading kernel. All float fields are leaves so gradients flow to them.
    """

    type_id: jax.Array  # (M,) int32
    color: jax.Array  # (M, 3) albedo (lambert) or reflectance (others)
    emission: jax.Array  # (M, 3) nonzero only for lambert (quirk #2)
    alpha: jax.Array  # (M,) phong/blinn exponent or ggx roughness
    ior: jax.Array  # (M,)
    absorbtance: jax.Array  # (M,)


@dataclass
class Geometry:
    """Triangle + sphere SoA. Prim ids: [0, T) triangles, [T, T+S) spheres."""

    tri_p0: jax.Array  # (T, 3)
    tri_e1: jax.Array  # (T, 3)  p1 - p0
    tri_e2: jax.Array  # (T, 3)  p2 - p0
    tri_n: jax.Array  # (T, 3) unit face normal (p1-p0) x (p2-p0)
    tri_mat: jax.Array  # (T,) int32
    sph_c: jax.Array  # (S, 3)
    sph_r: jax.Array  # (S,)
    sph_mat: jax.Array  # (S,) int32


@dataclass
class LightTable:
    """Area-emissive primitives for NEE (`objects.rs:18-51`).

    Carries light-local copies of the emitter geometry so point-on-light
    sampling never gathers from the (possibly huge) global prim tables —
    the light table itself stays tiny, so the wavefront selects rows with
    dense one-hot sums (ops/table.py)."""

    prim: jax.Array  # (L,) int32 prim ids
    area: jax.Array  # (L,)
    cdf: jax.Array  # (L,) inclusive prefix sum of areas
    total_area: jax.Array  # () sum of areas
    is_tri: jax.Array  # (L,) int32 1 = triangle, 0 = sphere
    p0: jax.Array  # (L, 3) triangle vertex (zeros for spheres)
    e1: jax.Array  # (L, 3)
    e2: jax.Array  # (L, 3)
    c: jax.Array  # (L, 3) sphere center (zeros for triangles)
    r: jax.Array  # (L,) sphere radius


@dataclass
class Bvh:
    """Flattened threaded (stackless) treelet BVH over triangles, DFS order.

    Traversal state is a single node cursor: on AABB hit at an inner node
    advance to `i+1`; otherwise (miss, or after visiting a leaf) jump to
    `miss[i]`; -1 terminates. Leaves are fixed-K treelet blocks: one
    contiguous gather fetches K triangles which are tested densely on the
    VPU — the TPU answer to the reference's pointer-chasing traversal
    (`bvh.rs:131-141`). Built host-side with the reference's exact SAH cost
    model (`bvh.rs:69-127`); see `accel/sah.py` + `accel/pack.py`. Spheres
    are intersected brute-force (scenes have few analytic spheres).
    """

    node_min: jax.Array  # (N, 3)
    node_max: jax.Array  # (N, 3)
    node_miss: jax.Array  # (N,) int32
    node_leaf: jax.Array  # (N,) int32 block id, or -1 for inner nodes
    blk_p0: jax.Array  # (L, K, 3)
    blk_e1: jax.Array  # (L, K, 3)
    blk_e2: jax.Array  # (L, K, 3)
    blk_n: jax.Array  # (L, K, 3) precomputed unit face normals
    blk_prim: jax.Array  # (L, K) int32 original tri prim id, -1 padding
    blk_mat: jax.Array  # (L, K) int32 material row, -1 padding
    # Pallas packet-traversal kernel layouts (ops/pallas_bvh.py); built
    # host-side by accel/pack.py:_pack_kernel_tables. Same data, packed
    # into full 128-lane rows so the kernel does scalar/row reads only.
    pk_nodes: jax.Array  # (Nn, 8) f32 — [min3 | max3 | miss | leaf]
    pk_blk: jax.Array  # (L*RPB, 128) f32 — 12 comps x K per block
    pk_pm: jax.Array  # (L*RPM, 128) i32 — [prim(K) | mat(K)] per block


@dataclass
class SkyData:
    color: jax.Array  # (3,) uniform emission / simple-sky meridian
    color2: jax.Array  # (3,) simple-sky horizon (zeros otherwise)
    ibl: jax.Array  # (H, 2H, 3) equirect texture ((1,2,3) dummy when uniform)
    longitude_offset: jax.Array  # () radians


@dataclass
class CameraData:
    """Precomputed camera frame (`camera.rs:33-62,365-409`)."""

    position: jax.Array  # (3,) sensor center
    aperture_position: jax.Array  # (3,)
    forward: jax.Array  # (3,)
    right: jax.Array  # (3,)
    up: jax.Array  # (3,)
    sensor_size: jax.Array  # (2,)
    aperture_radius: jax.Array  # ()
    focus_distance: jax.Array  # ()
    aperture_sensor_distance: jax.Array  # ()
    sensor_sensitivity: jax.Array  # ()


@dataclass
class SceneData:
    """Everything the render kernels need, as one pytree of arrays."""

    geometry: Geometry
    materials: MaterialTable
    lights: LightTable
    bvh: Bvh
    sky: SkyData
    camera: CameraData


@dataclass(frozen=True)
class RenderSettings:
    """Static (hashable) render configuration; part of the jit cache key."""

    width: int
    height: int
    spp: int
    depth: int = 5
    depth_limit: int = 64
    no_direct_emitter: bool = False
    integrator: str = "pt-direct"
    camera_kind: int = CAM_IDEAL_PINHOLE
    sky_kind: int = SKY_UNIFORM
    has_lights: bool = False
    # Hard cap on the bounce loop. The reference recursion is unbounded but
    # RR decays contribution by 0.5^(d - depth_limit) past depth_limit
    # (`scene.rs:64-76`); truncating a few halvings past the limit is
    # statistically invisible while keeping shapes static.
    max_bounces: int = 80
    # Intersector: "auto" picks brute force for small scenes, bvh otherwise.
    intersector: str = "auto"
    # Wavefront compaction: shrink the live wavefront at staged bounce
    # depths so dead lanes stop costing SIMD work (SURVEY §7 "hard part 2").
    # "pop-rr" = staged compaction with population-control Russian roulette
    # on capacity overflow (unbiased); "off" = plain masked loop.
    compaction: str = "pop-rr"
    # Material type ids present in the scene's table (static): the BSDF
    # kernels prune absent families' branches entirely (ops/bsdf.py). None
    # = assume all five.
    mat_types: tuple | None = None
    # Fused Pallas bounce-step kernel (ops/pallas_bounce.py): "auto" uses it
    # on TPU for scenes it supports (small prim/light/material tables,
    # uniform sky, forward rendering); "off" forces the XLA step; "on"
    # forces it wherever `supported` holds (even off-TPU, via interpreter).
    fused: str = "auto"
    # Differentiable-path rematerialization policy (integrator/wavefront.py
    # run_stage): "full" | "isect" | "isect+samp" | "none" | "hybrid".
    # Measured on the fwd+bwd benchmark (tools/bench_bwd.py,
    # BWD_REMAT.json) — see BASELINE.md.
    bwd_remat: str = "full"


for _cls in (MaterialTable, Geometry, LightTable, Bvh, SkyData, CameraData, SceneData):
    jax.tree_util.register_dataclass(
        _cls,
        data_fields=[f.name for f in dataclasses.fields(_cls)],
        meta_fields=[],
    )


def num_tris(scene: SceneData) -> int:
    return scene.geometry.tri_p0.shape[0]


def num_spheres(scene: SceneData) -> int:
    return scene.geometry.sph_c.shape[0]


def num_prims(scene: SceneData) -> int:
    return num_tris(scene) + num_spheres(scene)


def as_device(scene_np) -> SceneData:
    """numpy pytree -> device arrays (f32/i32)."""

    def conv(x):
        x = np.asarray(x)
        if x.dtype in (np.float64, np.float32):
            x = x.astype(np.float32)
        elif x.dtype in (np.int64, np.int32):
            x = x.astype(np.int32)
        return jax.numpy.asarray(x)

    return jax.tree_util.tree_map(conv, scene_np)
