"""Generate test/bench assets: obj models, mtl files, scene TOMLs, IBL hdr.

The reference scenes point at model files (`models/simple/cbox.obj`,
`models/bunny/bunny.obj`, ibl .hdr) that are NOT part of the reference repo,
so we author equivalents: the classic Cornell-box geometry, a unit quad, and
a procedural ~70k-triangle mesh with the Stanford-bunny's bounding box for
BVH-scale benchmarking. Scene TOMLs mirror the reference's
`scenes/*.toml` parameters (BASELINE.json's five configs).

Run: python tools/make_assets.py [out_dir]   (default: assets/)
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np


def _write_obj(path: Path, groups, mtllib=None):
    """groups: list of (name, mtl_name, [quad or tri vertex tuples])."""
    path.parent.mkdir(parents=True, exist_ok=True)
    lines = []
    if mtllib:
        lines.append(f"mtllib {mtllib}")
    index = 1
    for name, mtl, faces in groups:
        lines.append(f"o {name}")
        if mtl:
            lines.append(f"usemtl {mtl}")
        for face in faces:
            for v in face:
                lines.append(f"v {v[0]} {v[1]} {v[2]}")
            idx = list(range(index, index + len(face)))
            index += len(face)
            lines.append("f " + " ".join(str(i) for i in idx))
    path.write_text("\n".join(lines) + "\n")


def make_cbox(models_dir: Path):
    white = "white"
    red = "red"
    green = "green"
    mtl = """newmtl white
Kd 0.725 0.71 0.68
newmtl red
Kd 0.63 0.065 0.05
newmtl green
Kd 0.14 0.45 0.091
newmtl light
Kd 0.78 0.78 0.78
"""
    (models_dir / "simple").mkdir(parents=True, exist_ok=True)
    (models_dir / "simple" / "cbox.mtl").write_text(mtl)

    # Classic Cornell-box coordinates; windings chosen so face normals point
    # into the box (emission/NEE are front-face only in the renderer).
    floor = [(552.8, 0, 0), (0, 0, 0), (0, 0, 559.2), (549.6, 0, 559.2)]
    ceiling = [(556, 548.8, 0), (556, 548.8, 559.2), (0, 548.8, 559.2), (0, 548.8, 0)]
    back = [(549.6, 0, 559.2), (0, 0, 559.2), (0, 548.8, 559.2), (556, 548.8, 559.2)]
    rightw = [(0, 0, 559.2), (0, 0, 0), (0, 548.8, 0), (0, 548.8, 559.2)]
    leftw = [(552.8, 0, 0), (549.6, 0, 559.2), (556, 548.8, 559.2), (556, 548.8, 0)]
    _write_obj(
        models_dir / "simple" / "cbox.obj",
        [
            ("floor", white, [floor]),
            ("ceiling", white, [ceiling]),
            ("backWall", white, [back]),
            ("rightWall", green, [rightw]),
            ("leftWall", red, [leftw]),
        ],
        mtllib="cbox.mtl",
    )

    lum = [(343, 548.79, 227), (343, 548.79, 332), (213, 548.79, 332), (213, 548.79, 227)]
    (models_dir / "simple" / "cbox_luminaire.mtl").write_text(
        "newmtl light\nKd 0.78 0.78 0.78\n"
    )
    _write_obj(
        models_dir / "simple" / "cbox_luminaire.obj",
        [("light", "light", [lum])],
        mtllib="cbox_luminaire.mtl",
    )

    quad = [(-1, 0, -1), (-1, 0, 1), (1, 0, 1), (1, 0, -1)]  # +y normal
    (models_dir / "simple" / "quad.mtl").write_text(
        "newmtl white\nKd 0.725 0.71 0.68\n"
    )
    _write_obj(
        models_dir / "simple" / "quad.obj",
        [("quad", "white", [quad])],
        mtllib="quad.mtl",
    )


def make_bunny_substitute(models_dir: Path, subdiv: int = 6):
    """Procedural ~80k-triangle blob in the Stanford bunny's object-space
    bounding box (x in [-0.094, 0.061], y in [0.033, 0.187], z in
    [-0.062, 0.059]) — exercises BVH + traversal at bunny scale."""
    # Icosahedron.
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            (-1, t, 0), (1, t, 0), (-1, -t, 0), (1, -t, 0),
            (0, -1, t), (0, 1, t), (0, -1, -t), (0, 1, -t),
            (t, 0, -1), (t, 0, 1), (-t, 0, -1), (-t, 0, 1),
        ],
        dtype=np.float64,
    )
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array(
        [
            (0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
            (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
            (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
            (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1),
        ],
        dtype=np.int64,
    )
    for _ in range(subdiv):
        edge_mid: dict[tuple[int, int], int] = {}
        vlist = list(verts)

        def mid(a: int, b: int) -> int:
            key = (a, b) if a < b else (b, a)
            if key not in edge_mid:
                m = vlist[a] + vlist[b]
                m = m / np.linalg.norm(m)
                edge_mid[key] = len(vlist)
                vlist.append(m)
            return edge_mid[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        verts = np.asarray(vlist)
        faces = np.asarray(new_faces, dtype=np.int64)

    # Deterministic lumpy displacement (keeps it non-trivial for the BVH).
    x, y, z = verts[:, 0], verts[:, 1], verts[:, 2]
    bump = (
        0.10 * np.sin(7 * x + 1.3) * np.cos(5 * y)
        + 0.07 * np.sin(9 * z + 0.5) * np.cos(6 * x + 2.0)
        + 0.05 * np.sin(11 * y + 4.0)
    )
    verts = verts * (1.0 + bump)[:, None]
    # Fit the bunny's bounding box.
    lo = verts.min(axis=0)
    hi = verts.max(axis=0)
    target_lo = np.array([-0.094, 0.033, -0.062])
    target_hi = np.array([0.061, 0.187, 0.059])
    verts = (verts - lo) / (hi - lo) * (target_hi - target_lo) + target_lo

    out = models_dir / "bunny"
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "bunny.obj", "w") as f:
        f.write("o bunny\n")
        np.savetxt(f, verts, fmt="v %.6f %.6f %.6f")
        np.savetxt(f, faces + 1, fmt="f %d %d %d")
    return faces.shape[0]


def make_lamp_sphere(models_dir: Path, slices: int = 16, stacks: int = 9):
    """UV-sphere obj (unit radius) whose every face becomes its own light
    prim when bound to a [[light]] — slices=16/stacks=9 gives 256 triangles,
    past the renderer's DENSE_MAX=192 light-table threshold, exercising the
    searchsorted NEE pick path (`objects.rs:19-23`: emissive meshes register
    per-primitive lights in the reference too)."""
    verts = [(0.0, 1.0, 0.0)]
    for i in range(1, stacks):
        th = np.pi * i / stacks
        for j in range(slices):
            ph = 2 * np.pi * j / slices
            verts.append(
                (np.sin(th) * np.cos(ph), np.cos(th), np.sin(th) * np.sin(ph))
            )
    verts.append((0.0, -1.0, 0.0))
    bot = len(verts) - 1
    faces = []
    ring = lambda i, j: 1 + (i - 1) * slices + (j % slices)
    for j in range(slices):  # top cap (outward winding)
        faces.append((0, ring(1, j + 1), ring(1, j)))
    for i in range(1, stacks - 1):
        for j in range(slices):
            a, b = ring(i, j), ring(i, j + 1)
            c, d = ring(i + 1, j), ring(i + 1, j + 1)
            faces.append((a, b, d))
            faces.append((a, d, c))
    for j in range(slices):  # bottom cap
        faces.append((bot, ring(stacks - 1, j), ring(stacks - 1, j + 1)))
    out = models_dir / "simple" / "lamp_sphere.obj"
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        f.write("o lamp_sphere\n")
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces:
            f.write(f"f {a + 1} {b + 1} {c + 1}\n")
    return len(faces)


def make_ibl(models_dir: Path):
    """Small synthetic equirect HDR (sun + gradient sky) for IBL tests."""
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from lumillyrender_tpu.io.image import write_hdr

    h, w = 64, 128
    v = (np.arange(h) + 0.5) / h  # theta/pi
    u = (np.arange(w) + 0.5) / w
    theta = v * np.pi
    phi = u * 2 * np.pi - np.pi
    y = np.cos(theta)[:, None] * np.ones((1, w))
    sky_col = np.stack(
        [0.3 + 0.2 * y, 0.4 + 0.3 * y, 0.8 + 0.2 * y], axis=-1
    ).clip(0)
    # A bright "sun" disc.
    sun_dir = np.array([0.3, 0.8, 0.52])
    sun_dir /= np.linalg.norm(sun_dir)
    st = np.sin(theta)[:, None]
    dirs = np.stack(
        [st * np.cos(phi)[None, :], np.cos(theta)[:, None] * np.ones((1, w)),
         st * np.sin(phi)[None, :]],
        axis=-1,
    )
    cos_sun = (dirs * sun_dir).sum(-1)
    sky_col += np.where(cos_sun[..., None] > 0.995, 50.0, 0.0)
    ibl_dir = models_dir / "ibl"
    ibl_dir.mkdir(parents=True, exist_ok=True)
    write_hdr(ibl_dir / "test_sky.hdr", sky_col.astype(np.float32))


def main(out_dir: str = "assets") -> None:
    root = Path(out_dir)
    models = root / "models"
    make_cbox(models)
    n = make_bunny_substitute(models)
    nl = make_lamp_sphere(models)
    make_ibl(models)
    print(
        f"assets written to {root} (bunny substitute: {n} tris, "
        f"lamp sphere: {nl} tris)"
    )


if __name__ == "__main__":
    main(*sys.argv[1:])
