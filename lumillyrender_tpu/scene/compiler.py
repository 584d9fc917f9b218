"""Scene compiler: TOML config + assets -> device SoA arrays.

TPU-native replacement for `src/description.rs`: instead of instantiating
trait objects, we bake every object's transform into vertex positions
(`description.rs:164-197`), assign material-table rows, collect emissive
primitives into a light table (`objects.rs:18-29`), build the flattened SAH
BVH and precompute the camera frame (`camera.rs:33-62,365-409`).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np

from ..accel import sah
from ..constants import PI
from ..io.image import read_hdr
from . import transform as xf
from .data import (
    CAM_IDEAL_PINHOLE,
    CAM_PINHOLE,
    CAM_OMNIDIRECTIONAL,
    CAM_THIN_LENS,
    MAT_BLINN_PHONG,
    MAT_GGX,
    MAT_LAMBERT,
    MAT_PHONG,
    MAT_REFRACTION,
    SKY_IBL,
    SKY_SIMPLE,
    SKY_UNIFORM,
    Bvh,
    SkyData,
    CameraData,
    Geometry,
    LightTable,
    MaterialTable,
    RenderSettings,
    SceneData,
    as_device,
)
from .loader import Config, MaterialConfig, load_config
from .obj import load_obj

_MAT_TYPE = {
    "lambert": MAT_LAMBERT,
    "phong": MAT_PHONG,
    "blinn-phong": MAT_BLINN_PHONG,
    "ggx": MAT_GGX,
    "ideal-refraction": MAT_REFRACTION,
}


@dataclass
class CompiledScene:
    data: SceneData  # device arrays
    settings: RenderSettings
    config: Config
    stats: dict


class _MaterialBuilder:
    """Accumulates material rows; one row per (config material, emission) or
    per mtl diffuse color (obj fallback, `description.rs:164-180`)."""

    def __init__(self):
        self.type_id: list[int] = []
        self.color: list[tuple] = []
        self.emission: list[tuple] = []
        self.alpha: list[float] = []
        self.ior: list[float] = []
        self.absorb: list[float] = []
        self._cache: dict = {}

    def add(self, mat: MaterialConfig | None, emission, diffuse=None) -> int:
        """Row for an object's material.

        Emission attaches only to Lambert rows (`description.rs:97-101` —
        quirk #2: other material constructors simply drop it). If `mat` is
        None, `diffuse` (from the .mtl) makes a Lambert row.
        """
        emission = tuple(float(e) for e in (emission or (0.0, 0.0, 0.0)))
        if mat is None:
            key = ("mtl", tuple(diffuse), emission)
            if key in self._cache:
                return self._cache[key]
            row = self._push(MAT_LAMBERT, tuple(diffuse), emission, 0.0, 1.0, 0.0)
        else:
            key = (mat.name, id(mat), emission)
            if key in self._cache:
                return self._cache[key]
            t = _MAT_TYPE[mat.type]
            if t == MAT_LAMBERT:
                row = self._push(t, mat.albedo, emission, 0.0, 1.0, 0.0)
            elif t in (MAT_PHONG, MAT_BLINN_PHONG):
                row = self._push(t, mat.reflectance, (0.0, 0.0, 0.0), mat.alpha, 1.0, 0.0)
            elif t == MAT_GGX:
                row = self._push(t, mat.reflectance, (0.0, 0.0, 0.0), mat.roughness, mat.ior, 0.0)
            else:
                row = self._push(
                    t, mat.reflectance, (0.0, 0.0, 0.0), 0.0, mat.ior, mat.absorbtance
                )
        self._cache[key] = row
        return row

    def _push(self, t, color, emission, alpha, ior, absorb) -> int:
        self.type_id.append(t)
        self.color.append(tuple(float(c) for c in color))
        self.emission.append(tuple(float(e) for e in emission))
        self.alpha.append(float(alpha))
        self.ior.append(float(ior))
        self.absorb.append(float(absorb))
        return len(self.type_id) - 1

    def table(self) -> MaterialTable:
        n = max(len(self.type_id), 1)
        if not self.type_id:  # keep shapes non-empty for jit friendliness
            self._push(MAT_LAMBERT, (0.0, 0.0, 0.0), (0.0, 0.0, 0.0), 0.0, 1.0, 0.0)
        return MaterialTable(
            type_id=np.asarray(self.type_id, np.int32),
            color=np.asarray(self.color, np.float64).reshape(n, 3),
            emission=np.asarray(self.emission, np.float64).reshape(n, 3),
            alpha=np.asarray(self.alpha, np.float64),
            ior=np.asarray(self.ior, np.float64),
            absorbtance=np.asarray(self.absorb, np.float64),
        )


def _build_camera(config: Config) -> tuple[CameraData, int]:
    cam = config.camera
    width, height = config.film.resolution
    m = xf.compose(list(cam.transform))
    aperture_position = xf.row3(m)  # `camera.rs:39` — row 3, not column 3
    forward, right, up = xf.basis(m)

    z3 = np.zeros(3)
    if cam.type == "omnidirectional":
        return (
            CameraData(
                position=z3,
                aperture_position=aperture_position,
                forward=forward, right=right, up=up,
                sensor_size=np.zeros(2),
                aperture_radius=np.float64(0.0),
                focus_distance=np.float64(0.0),
                aperture_sensor_distance=np.float64(0.0),
                sensor_sensitivity=np.float64(1.0),
            ),
            CAM_OMNIDIRECTIONAL,
        )

    # Shared pinhole/thin-lens frame: virtual sensor 50 units behind the
    # aperture (`camera.rs:44-51,378-385`).
    direction = forward * 50.0
    position = aperture_position - direction
    asd = float(np.linalg.norm(direction))
    sx = 2.0 * asd * np.tan(cam.fov * PI / 180.0 / 2.0)
    sy = sx * height / width

    if cam.type == "ideal-pinhole":
        return (
            CameraData(
                position=position,
                aperture_position=aperture_position,
                forward=forward, right=right, up=up,
                sensor_size=np.array([sx, sy]),
                aperture_radius=np.float64(0.0),
                focus_distance=np.float64(0.0),
                aperture_sensor_distance=np.float64(asd),
                sensor_sensitivity=np.float64(1.0),  # `camera.rs:117-119`
            ),
            CAM_IDEAL_PINHOLE,
        )

    if cam.type == "pinhole":
        # Realistic pinhole (`camera.rs:223-264`): finite aperture, no
        # focus-plane projection; sensitivity cancels the sampling pdfs.
        r = max(cam.aperture_radius, 1e-6)
        pixel_area = (sx * sy) / (width * height)
        sensitivity = asd * asd / (pixel_area * PI * r * r)
        return (
            CameraData(
                position=position,
                aperture_position=aperture_position,
                forward=forward, right=right, up=up,
                sensor_size=np.array([sx, sy]),
                aperture_radius=np.float64(r),
                focus_distance=np.float64(0.0),
                aperture_sensor_distance=np.float64(asd),
                sensor_sensitivity=np.float64(sensitivity),
            ),
            CAM_PINHOLE,
        )

    # thin-lens (`camera.rs:386-394`)
    focal_length = 1.0 / (1.0 / asd + 1.0 / cam.focus_distance)
    aperture_radius = focal_length / cam.f_number / 2.0
    pixel_area = (sx * sy) / (width * height)
    sensitivity = asd * asd / (pixel_area * PI * aperture_radius * aperture_radius)
    return (
        CameraData(
            position=position,
            aperture_position=aperture_position,
            forward=forward, right=right, up=up,
            sensor_size=np.array([sx, sy]),
            aperture_radius=np.float64(aperture_radius),
            focus_distance=np.float64(cam.focus_distance),
            aperture_sensor_distance=np.float64(asd),
            sensor_sensitivity=np.float64(sensitivity),
        ),
        CAM_THIN_LENS,
    )


def compile_scene(config: Config, spp: int | None = None) -> CompiledScene:
    t_start = time.monotonic()
    mats = _MaterialBuilder()

    tri_p0, tri_p1, tri_p2, tri_mat = [], [], [], []
    sph_c, sph_r, sph_mat = [], [], []

    obj_cache: dict[str, object] = {}
    for od in config.object_descriptors():
        m = xf.compose(list(od.transform))
        emission = od.emission  # None unless this object is an area light
        if od.mesh.type == "sphere":
            if od.material is None:
                raise ValueError(f"Material must be specified for object `{od.mesh.name}`")
            row = mats.add(od.material, emission)
            # Sphere center = transform * origin (`description.rs:137-142`).
            sph_c.append(xf.apply_point(m, np.zeros(3)))
            sph_r.append(od.mesh.radius)
            sph_mat.append(row)
        else:
            if od.mesh.name not in obj_cache:
                obj_cache[od.mesh.name] = load_obj(config.resolve_path(od.mesh.path))
            objf = obj_cache[od.mesh.name]
            # Per-mtl fallback Lambert rows (`description.rs:164-180`); the
            # object's emission is applied to them too (quirk of
            # `description.rs:166-169`).
            mtl_rows = {
                i: mats.add(None, emission, diffuse=om.diffuse)
                for i, om in enumerate(objf.materials)
            }
            default_row = mats.add(od.material, emission) if od.material else None
            for model in objf.models:
                if default_row is not None:
                    row = default_row
                elif model.material_id is not None:
                    row = mtl_rows[model.material_id]
                else:
                    raise ValueError("Specified material is not found in mtl file.")
                verts = xf.apply_point(m, objf.positions)  # transform baked in
                tris = verts[model.indices.reshape(-1, 3)]
                tri_p0.append(tris[:, 0])
                tri_p1.append(tris[:, 1])
                tri_p2.append(tris[:, 2])
                tri_mat.append(np.full(tris.shape[0], row, np.int32))

    def cat(parts, shape):
        return (
            np.concatenate(parts, axis=0)
            if parts
            else np.zeros(shape, np.float64)
        )

    p0 = cat(tri_p0, (0, 3))
    p1 = cat(tri_p1, (0, 3))
    p2 = cat(tri_p2, (0, 3))
    e1, e2 = p1 - p0, p2 - p0
    n = np.cross(e1, e2)
    n_len = np.linalg.norm(n, axis=1, keepdims=True)
    tri_area = 0.5 * n_len[:, 0]
    tri_n = n / np.where(n_len > 0, n_len, 1.0)
    t_mat = (
        np.concatenate(tri_mat) if tri_mat else np.zeros((0,), np.int32)
    )

    s_c = cat(sph_c, (0, 3)).reshape(-1, 3)
    s_r = np.asarray(sph_r, np.float64)
    s_mat = np.asarray(sph_mat, np.int32)
    sph_area = 4.0 * PI * s_r**2

    geometry = Geometry(
        tri_p0=p0, tri_e1=e1, tri_e2=e2, tri_n=tri_n, tri_mat=t_mat,
        sph_c=s_c, sph_r=s_r, sph_mat=s_mat,
    )
    material_table = mats.table()

    # Light table: emissive prims, area-proportional CDF (`objects.rs:18-51`).
    prim_mat = np.concatenate([t_mat, s_mat]) if (t_mat.size or s_mat.size) else np.zeros(0, np.int32)
    prim_area = np.concatenate([tri_area, sph_area]) if prim_mat.size else np.zeros(0)
    emissive_rows = (np.linalg.norm(material_table.emission, axis=1) ** 2) > 0.0
    is_light = emissive_rows[prim_mat] if prim_mat.size else np.zeros(0, bool)
    light_prim = np.nonzero(is_light)[0].astype(np.int32)
    light_area = prim_area[light_prim] if light_prim.size else np.zeros(0)
    total_area = float(light_area.sum())
    cdf = np.cumsum(light_area)
    if light_prim.size == 0:  # keep non-empty shapes
        light_prim = np.array([0], np.int32)
        light_area = np.zeros(1)
        cdf = np.zeros(1)
    # Light-local geometry (emitters are few; see LightTable docstring).
    nlt = light_prim.shape[0]
    l_is_tri = np.zeros(nlt, np.int32)
    l_p0 = np.zeros((nlt, 3))
    l_e1 = np.zeros((nlt, 3))
    l_e2 = np.zeros((nlt, 3))
    l_c = np.zeros((nlt, 3))
    l_r = np.zeros(nlt)
    ntri = p0.shape[0]
    for k, pid in enumerate(light_prim):
        if pid < ntri and ntri:
            l_is_tri[k] = 1
            l_p0[k], l_e1[k], l_e2[k] = p0[pid], e1[pid], e2[pid]
        elif s_r.size:
            l_c[k], l_r[k] = s_c[pid - ntri], s_r[pid - ntri]
    lights = LightTable(
        prim=light_prim,
        area=light_area,
        cdf=cdf,
        total_area=np.float64(total_area),
        is_tri=l_is_tri,
        p0=l_p0,
        e1=l_e1,
        e2=l_e2,
        c=l_c,
        r=l_r,
    )

    # Treelet BVH over triangles (spheres stay brute-force in traversal).
    # Meshes past the packet kernel's resident-table capacity get K=128
    # leaves instead, which routes traversal to the wide-leaf kernel
    # (ops/pallas_bvh_wide.py) — measured faster than HBM-streaming at
    # 1M tris and fully VMEM-resident to ~1.6M (BIGMESH.json).
    t_bvh = time.monotonic()
    from ..accel.pack import WIDE_MIN_TRIS, build_tri_bvh

    max_leaf = 128 if p0.shape[0] >= WIDE_MIN_TRIS else None
    bvh = Bvh(**build_tri_bvh(p0, e1, e2, tri_n=tri_n, tri_mat=t_mat,
                              max_leaf=max_leaf))
    bvh_seconds = time.monotonic() - t_bvh

    # Sky (`description.rs:58-65`; missing [sky] -> black uniform).
    sky_kind = SKY_UNIFORM
    sky_color = np.zeros(3)
    ibl = np.zeros((1, 2, 3), np.float32)
    lon = 0.0
    sky_color2 = np.zeros(3)
    if config.sky is not None:
        if config.sky.type == "uniform":
            sky_color = np.asarray(config.sky.color, np.float64)
        elif config.sky.type == "simple":
            sky_kind = SKY_SIMPLE
            sky_color = np.asarray(config.sky.meridian, np.float64)
            sky_color2 = np.asarray(config.sky.horizon, np.float64)
        else:
            sky_kind = SKY_IBL
            ibl = read_hdr(config.resolve_path(config.sky.path))
            # Reference indexes assuming width == 2*height (`sky.rs:58-78`).
            lon = config.sky.longitude_offset
    sky = SkyData(
        color=sky_color,
        color2=sky_color2,
        ibl=np.asarray(ibl, np.float32),
        longitude_offset=np.float64(lon),
    )

    camera, cam_kind = _build_camera(config)

    scene_np = SceneData(
        geometry=geometry, materials=material_table, lights=lights,
        bvh=bvh, sky=sky, camera=camera,
    )

    settings = RenderSettings(
        width=config.film.resolution[0],
        height=config.film.resolution[1],
        spp=spp if spp is not None else config.renderer.samples,
        depth=config.renderer.depth,
        depth_limit=config.renderer.depth_limit,
        no_direct_emitter=config.renderer.no_direct_emitter,
        integrator=config.renderer.integrator,
        camera_kind=cam_kind,
        sky_kind=sky_kind,
        has_lights=total_area > 0.0,
        mat_types=tuple(
            sorted(int(t) for t in np.unique(material_table.type_id))
        ),
    )

    stats = {
        "polygons": int(p0.shape[0]),
        "spheres": int(s_r.shape[0]),
        "materials": int(material_table.type_id.shape[0]),
        "lights": int((light_area > 0).sum()),
        "bvh_seconds": bvh_seconds,
        "compile_seconds": time.monotonic() - t_start,
    }
    return CompiledScene(
        data=as_device(scene_np), settings=settings, config=config, stats=stats
    )


def compile_scene_file(path, spp: int | None = None) -> CompiledScene:
    return compile_scene(load_config(path), spp=spp)
