"""Minimal Wavefront .obj/.mtl parser with the semantics the reference relies on.

Parity: reference uses `tobj 0.1` (`description.rs:150-162`), consuming only
vertex positions, triangle indices, and per-group material ids whose `Kd`
(diffuse) becomes a Lambert albedo (`description.rs:164-197`). Normals, UVs
and smoothing are ignored — triangles get flat face normals. Polygons are
fan-triangulated.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import numpy as np


@dataclass
class ObjMaterial:
    name: str
    diffuse: tuple[float, float, float] = (0.0, 0.0, 0.0)


@dataclass
class ObjModel:
    """One obj group/object: triangle soup indices into shared positions."""

    name: str
    indices: np.ndarray  # (F*3,) int32 into positions
    material_id: int | None = None


@dataclass
class ObjFile:
    positions: np.ndarray  # (V, 3) float64
    models: list[ObjModel] = field(default_factory=list)
    materials: list[ObjMaterial] = field(default_factory=list)


def _parse_mtl(path: Path) -> list[ObjMaterial]:
    materials: list[ObjMaterial] = []
    if not path.is_file():
        return materials
    cur: ObjMaterial | None = None
    for line in path.read_text().splitlines():
        parts = line.split()
        if not parts or parts[0].startswith("#"):
            continue
        if parts[0] == "newmtl":
            cur = ObjMaterial(name=parts[1] if len(parts) > 1 else "")
            materials.append(cur)
        elif parts[0] == "Kd" and cur is not None:
            cur.diffuse = (float(parts[1]), float(parts[2]), float(parts[3]))
    return materials


def load_obj(path: str | Path) -> ObjFile:
    path = Path(path)
    positions: list[tuple[float, float, float]] = []
    materials: list[ObjMaterial] = []
    mat_index: dict[str, int] = {}

    models: list[ObjModel] = []
    cur_name = "default"
    cur_mat: int | None = None
    cur_indices: list[int] = []

    def flush():
        nonlocal cur_indices
        if cur_indices:
            models.append(
                ObjModel(
                    name=cur_name,
                    indices=np.asarray(cur_indices, dtype=np.int32),
                    material_id=cur_mat,
                )
            )
            cur_indices = []

    for line in path.read_text().splitlines():
        parts = line.split()
        if not parts or parts[0].startswith("#"):
            continue
        tag = parts[0]
        if tag == "v":
            positions.append((float(parts[1]), float(parts[2]), float(parts[3])))
        elif tag == "f":
            # "v", "v/vt", "v//vn", "v/vt/vn"; negative indices are relative.
            idx = []
            for p in parts[1:]:
                i = int(p.split("/")[0])
                idx.append(i - 1 if i > 0 else len(positions) + i)
            for k in range(1, len(idx) - 1):  # fan triangulation
                cur_indices.extend((idx[0], idx[k], idx[k + 1]))
        elif tag in ("o", "g"):
            flush()
            cur_name = parts[1] if len(parts) > 1 else "default"
        elif tag == "usemtl":
            flush()
            name = parts[1] if len(parts) > 1 else ""
            cur_mat = mat_index.get(name)
        elif tag == "mtllib":
            for mtl in _parse_mtl(path.parent / parts[1]):
                if mtl.name not in mat_index:
                    mat_index[mtl.name] = len(materials)
                    materials.append(mtl)
    flush()

    return ObjFile(
        positions=np.asarray(positions, dtype=np.float64).reshape(-1, 3),
        models=models,
        materials=materials,
    )
