"""Scene description (TOML) schema.

Parity: reference `src/scene_loader.rs`. Input-compatible with the
reference's `scenes/*.toml`: same tables, kebab-case keys, tagged enums,
same defaults applied at the same places.

This module only parses and joins; array building lives in `compiler.py`.
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

Vec3 = tuple[float, float, float]


def _vec3(v) -> Vec3:
    x, y, z = v
    return (float(x), float(y), float(z))


@dataclass(frozen=True)
class RendererConfig:
    """`[renderer]` (`scene_loader.rs:8-17`); defaults from use-sites:

    depth=5 / depth_limit=64 / no_direct_emitter=False (`description.rs:75-79`),
    integrator="pt-direct" (`main.rs:66`), threads<=0 -> all cores
    (`main.rs:61-63`).
    """

    samples: int
    depth: int = 5
    depth_limit: int = 64
    no_direct_emitter: bool = False
    threads: int = 0
    integrator: str = "pt-direct"


@dataclass(frozen=True)
class FilmConfig:
    """`[film]` (`scene_loader.rs:19-26`). gamma default 2.2 (`main.rs:136`).

    `sensitivity` is parsed but never read — reference quirk #21.
    """

    resolution: tuple[int, int]
    output: str
    gamma: float = 2.2
    sensitivity: Vec3 | None = None


@dataclass(frozen=True)
class SkyConfig:
    """`[sky]` tagged enum (`scene_loader.rs:28-40`): uniform | ibl, plus
    `simple` (the reference's dead `SimpleSky`, `sky.rs:23-33`, made
    reachable as an extension)."""

    type: str
    color: Vec3 = (0.0, 0.0, 0.0)
    path: str = ""
    longitude_offset: float = 0.0  # radians (quirk #14)
    meridian: Vec3 = (0.0, 0.0, 0.0)
    horizon: Vec3 = (0.0, 0.0, 0.0)


@dataclass(frozen=True)
class CameraConfig:
    """`[camera]` tagged enum (`scene_loader.rs:106-125`), plus `pinhole`
    (the reference's unreachable "realistic pinhole", `camera.rs:199-337`,
    made reachable as an extension: finite aperture, no focus plane)."""

    type: str  # ideal-pinhole | thin-lens | omnidirectional | pinhole
    fov: float = 0.0
    focus_distance: float = 0.0
    f_number: float = 0.0
    aperture_radius: float = 0.0
    transform: tuple[dict, ...] = ()


@dataclass(frozen=True)
class MaterialConfig:
    """`[[material]]` tagged enum (`scene_loader.rs:141-171`)."""

    name: str
    type: str  # lambert | phong | blinn-phong | ggx | ideal-refraction
    albedo: Vec3 = (0.0, 0.0, 0.0)
    reflectance: Vec3 = (0.0, 0.0, 0.0)
    alpha: float = 0.0
    roughness: float = 0.0
    ior: float = 1.0
    absorbtance: float = 0.0


@dataclass(frozen=True)
class MeshConfig:
    """`[[mesh]]` tagged enum (`scene_loader.rs:185-196`): obj | sphere."""

    name: str
    type: str
    path: str = ""
    radius: float = 0.0


@dataclass(frozen=True)
class ObjectConfig:
    """`[[object]]` (`scene_loader.rs:52-60`)."""

    mesh: str
    name: str | None = None
    material: str | None = None
    transform: tuple[dict, ...] = ()


@dataclass(frozen=True)
class LightConfig:
    """`[[light]]` area light joined to an object by name (`scene_loader.rs:42-50`)."""

    object: str
    emission: Vec3
    intensity: float = 1.0


@dataclass
class ObjectDescriptor:
    """Join of object -> mesh/material/light emission (`scene_loader.rs:248-270`)."""

    mesh: MeshConfig
    material: MaterialConfig | None
    transform: tuple[dict, ...]
    emission: Vec3 | None  # emission * intensity, or None if not a light


@dataclass
class Config:
    renderer: RendererConfig
    film: FilmConfig
    camera: CameraConfig
    sky: SkyConfig | None
    lights: list[LightConfig] = field(default_factory=list)
    objects: list[ObjectConfig] = field(default_factory=list)
    materials: list[MaterialConfig] = field(default_factory=list)
    meshes: list[MeshConfig] = field(default_factory=list)
    # Directory the .toml lives in; mesh/ibl paths resolve relative to the
    # process CWD in the reference (it just opens the literal path). We try
    # CWD first then fall back to the scene dir for ergonomics.
    base_dir: Path = field(default_factory=Path)

    def find_mesh(self, name: str) -> MeshConfig:
        for m in self.meshes:
            if m.name == name:
                return m
        raise KeyError(f"Mesh named `{name}` is not found.")

    def find_material(self, name: str) -> MaterialConfig:
        for m in self.materials:
            if m.name == name:
                return m
        raise KeyError(f"Material named `{name}` is not found.")

    def object_descriptors(self) -> list[ObjectDescriptor]:
        """The object/mesh/material/light join (`scene_loader.rs:248-270`)."""
        out = []
        for o in self.objects:
            mesh = self.find_mesh(o.mesh)
            material = self.find_material(o.material) if o.material else None
            emission = None
            for l in self.lights:
                if o.name is not None and o.name == l.object:
                    e = l.emission
                    emission = (e[0] * l.intensity, e[1] * l.intensity, e[2] * l.intensity)
                    break
            out.append(ObjectDescriptor(mesh, material, o.transform, emission))
        return out

    def resolve_path(self, path: str) -> Path:
        p = Path(path)
        if p.exists():
            return p
        q = self.base_dir / path
        if q.exists():
            return q
        raise FileNotFoundError(f"File `{path}` is not found.")


def _kebab(d: dict[str, Any]) -> dict[str, Any]:
    """kebab-case keys -> snake_case attrs (serde rename, `scene_loader.rs:9`).

    The reference also tolerates snake_case for some scenes
    (welcome-2018.toml uses `focus_distance`) because serde aliases don't —
    actually serde with rename_all kebab-case would NOT accept snake_case;
    but the shipped welcome-2018.toml uses focus_distance, which would fail
    to parse camera-specific keys in the reference. We accept both spellings.
    """
    return {k.replace("-", "_"): v for k, v in d.items()}


def parse_config(toml_str: str, base_dir: Path | str = ".") -> Config:
    raw = tomllib.loads(toml_str)

    r = _kebab(raw["renderer"])
    renderer = RendererConfig(
        samples=int(r["samples"]),
        depth=int(r.get("depth", 5)),
        depth_limit=int(r.get("depth_limit", 64)),
        no_direct_emitter=bool(r.get("no_direct_emitter", False)),
        threads=int(r.get("threads", 0)),
        integrator=str(r.get("integrator", "pt-direct")),
    )

    f = _kebab(raw["film"])
    film = FilmConfig(
        resolution=(int(f["resolution"][0]), int(f["resolution"][1])),
        output=str(f["output"]),
        gamma=float(f.get("gamma", 2.2)),
        sensitivity=_vec3(f["sensitivity"]) if "sensitivity" in f else None,
    )

    sky = None
    if "sky" in raw:
        s = _kebab(raw["sky"])
        if s["type"] == "uniform":
            sky = SkyConfig(type="uniform", color=_vec3(s["color"]))
        elif s["type"] == "ibl":
            sky = SkyConfig(
                type="ibl",
                path=str(s["path"]),
                longitude_offset=float(s.get("longitude_offset", 0.0)),
            )
        elif s["type"] == "simple":
            sky = SkyConfig(
                type="simple",
                meridian=_vec3(s["meridian"]),
                horizon=_vec3(s["horizon"]),
            )
        else:
            raise ValueError(f"Unknown sky type `{s['type']}`")

    c = _kebab(raw["camera"])
    ckind = c["type"]
    if ckind not in ("ideal-pinhole", "thin-lens", "omnidirectional", "pinhole"):
        raise ValueError(f"Unknown camera type `{ckind}`")
    camera = CameraConfig(
        type=ckind,
        fov=float(c.get("fov", 0.0)),
        focus_distance=float(c.get("focus_distance", 0.0)),
        f_number=float(c.get("f_number", 0.0)),
        aperture_radius=float(c.get("aperture_radius", 0.0)),
        transform=tuple(c.get("transform", ())),
    )

    lights = []
    for l in raw.get("light", ()):
        l = _kebab(l)
        if l["type"] != "area":
            raise ValueError(f"Unknown light type `{l['type']}`")
        lights.append(
            LightConfig(
                object=str(l["object"]),
                emission=_vec3(l["emission"]),
                intensity=float(l.get("intensity", 1.0)),
            )
        )

    objects = []
    for o in raw.get("object", ()):
        o = _kebab(o)
        objects.append(
            ObjectConfig(
                mesh=str(o["mesh"]),
                name=o.get("name"),
                material=o.get("material"),
                transform=tuple(o.get("transform", ())),
            )
        )

    materials = []
    for m in raw.get("material", ()):
        m = _kebab(m)
        kind = m["type"]
        if kind == "lambert":
            mat = MaterialConfig(name=m["name"], type=kind, albedo=_vec3(m["albedo"]))
        elif kind in ("phong", "blinn-phong"):
            mat = MaterialConfig(
                name=m["name"], type=kind,
                reflectance=_vec3(m["reflectance"]), alpha=float(m["alpha"]),
            )
        elif kind == "ggx":
            mat = MaterialConfig(
                name=m["name"], type=kind,
                reflectance=_vec3(m["reflectance"]),
                roughness=float(m["roughness"]), ior=float(m["ior"]),
            )
        elif kind == "ideal-refraction":
            mat = MaterialConfig(
                name=m["name"], type=kind,
                reflectance=_vec3(m["reflectance"]),
                absorbtance=float(m.get("absorbtance", 0.0)), ior=float(m["ior"]),
            )
        else:
            raise ValueError(f"Unknown material type `{kind}`")
        materials.append(mat)

    meshes = []
    for m in raw.get("mesh", ()):
        m = _kebab(m)
        if m["type"] == "obj":
            meshes.append(MeshConfig(name=m["name"], type="obj", path=str(m["path"])))
        elif m["type"] == "sphere":
            meshes.append(MeshConfig(name=m["name"], type="sphere", radius=float(m["radius"])))
        else:
            raise ValueError(f"Unknown mesh type `{m['type']}`")

    return Config(
        renderer=renderer, film=film, camera=camera, sky=sky,
        lights=lights, objects=objects, materials=materials, meshes=meshes,
        base_dir=Path(base_dir),
    )


def load_config(path: str | Path) -> Config:
    p = Path(path)
    if not p.is_file():
        raise FileNotFoundError(f"File `{path}` is not found.")
    return parse_config(p.read_text(), base_dir=p.parent)
