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


def _hero_env(h, w, sun_dir, sun_e, sky_zenith, sky_horizon, ground,
              sun_cos=0.9985, haze=0.0):
    """Procedural equirect HDR: sun disc + sky gradient + ground hemisphere.

    Substitute for the reference's gallery HDRIs (PaperMill_Ruins_E /
    14-Hamarikyu_Bridge_B), which are external downloads the reference repo
    does not ship either (`/root/reference/scenes/ridaisai-2018.toml:19`,
    `welcome-2018.toml:16` point at `models/ibl/*.hdr` absent from the
    tree). Radiometric scale chosen so exposure matches the gallery's look
    (sun ~3 orders over sky)."""
    v = (np.arange(h) + 0.5) / h
    u = (np.arange(w) + 0.5) / w
    theta = v * np.pi
    phi = u * 2 * np.pi - np.pi
    st = np.sin(theta)[:, None]
    y = np.cos(theta)[:, None] * np.ones((1, w))
    dirs = np.stack(
        [st * np.cos(phi)[None, :], y, st * np.sin(phi)[None, :]], axis=-1
    )
    sun_dir = np.asarray(sun_dir, float)
    sun_dir /= np.linalg.norm(sun_dir)
    t = np.clip(y, 0.0, 1.0)[..., None]
    sky = (
        np.asarray(sky_horizon) * (1.0 - t) + np.asarray(sky_zenith) * t
    )
    img = np.where(y[..., None] > 0.0, sky, np.asarray(ground) * 1.0)
    # Soft horizon band + cloud-ish longitudinal variation.
    band = np.exp(-((y / 0.08) ** 2))[..., None]
    img = img + band * np.asarray(sky_horizon) * 0.5
    wob = 0.15 * np.sin(3.0 * phi)[None, :, None] * np.maximum(y, 0)[..., None]
    img = img * (1.0 + wob)
    cos_sun = (dirs * sun_dir).sum(-1)
    img = img + np.where(
        cos_sun[..., None] > sun_cos, np.asarray(sun_e), 0.0
    )
    if haze > 0.0:  # forward-scattering glow around the sun
        img = img + (
            haze * np.clip(cos_sun, 0, 1)[..., None] ** 32 * np.asarray(sun_e)
            * 0.02
        )
    return np.clip(img, 0.0, None).astype(np.float32)


def make_hero_ibls(models_dir: Path):
    """HDRIs for the two hero scenes (ridaisai / welcome)."""
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from lumillyrender_tpu.io.image import write_hdr

    ibl_dir = models_dir / "ibl"
    ibl_dir.mkdir(parents=True, exist_ok=True)
    # Warm late-afternoon ruins courtyard (PaperMill stand-in). The sun
    # disc is kept WIDE (cos 0.993 ~ 6.8 deg) at matched flux: ridaisai is
    # pure pt, so a tiny hot sun turns every cosine-sampled floor bounce
    # into a firefly lottery the reference's own gallery avoided with
    # 10k spp budgets.
    write_hdr(
        ibl_dir / "paper_mill.hdr",
        _hero_env(
            256, 512,
            sun_dir=[0.45, 0.35, -0.82], sun_e=[195.0, 156.0, 113.0],
            sky_zenith=[0.35, 0.55, 1.0], sky_horizon=[1.1, 0.9, 0.7],
            ground=[0.30, 0.24, 0.18], haze=1.0, sun_cos=0.993,
        ),
    )
    # Overcast-bright waterside bridge (Hamarikyu stand-in).
    write_hdr(
        ibl_dir / "hamarikyu.hdr",
        _hero_env(
            256, 512,
            sun_dir=[-0.3, 0.75, 0.59], sun_e=[400.0, 400.0, 380.0],
            sky_zenith=[0.8, 0.9, 1.1], sky_horizon=[1.3, 1.3, 1.25],
            ground=[0.12, 0.14, 0.12], sun_cos=0.995,
        ),
    )


# Hero scene TOMLs: asset-complete equivalents of the reference's gallery
# configurations, parameter-for-parameter (camera stack incl. the post
# look-at axis-angle tilt, refraction materials, light joins) with repo
# asset paths substituted for the unshipped external downloads.
RIDAISAI_TOML = """\
# Hero parity: /root/reference/scenes/ridaisai-2018.toml (the gallery's
# most demanding config: thin-lens f/1.8 + IBL + two refractive bunny
# meshes + pure pt + 2138x1536 hdr). HDRI is the procedural PaperMill
# stand-in (tools/make_assets.py:make_hero_ibls).
[renderer]
samples = 4
depth = 5
depth-limit = 64
no-direct-emitter = false
threads = 0
integrator = "pt"

[film]
resolution = [2138, 1536]
output = "hdr"
gamma = 2.2
sensitivity = [1, 1, 1]

[sky]
type = "ibl"
path = "models/ibl/paper_mill.hdr"
longitude-offset = 6.0

[camera]
type = "thin-lens"
fov = 39.3077
focus-distance = 850
f-number = 1.8
[[camera.transform]]
type = "look-at"
origin = [278, 400, -600]
target = [278, 400, 0]
up = [0, 1, 0]
[[camera.transform]]
type = "axis-angle"
axis = [1, 0, 0]
angle = 20

[[object]]
mesh = "bunny"
material = "translucent-orange"
[[object.transform]]
type = "axis-angle"
axis = [0, 1, 0]
angle = 185
[[object.transform]]
type = "scale"
vector = [130, 130, 130]
[[object.transform]]
type = "translate"
vector = [155, -6, 218]

[[object]]
mesh = "bunny"
material = "translucent-black"
[[object.transform]]
type = "axis-angle"
axis = [0, 1, 0]
angle = 185
[[object.transform]]
type = "scale"
vector = [130, 130, 130]
[[object.transform]]
type = "translate"
vector = [355, -6, 218]

[[object]]
mesh = "quad"
material = "white"
[[object.transform]]
type = "scale"
vector = [400, 1, 400]
[[object.transform]]
type = "translate"
vector = [278, 1, 278]

[[material]]
name = "white"
type = "lambert"
albedo = [0.740063, 0.742313, 0.733934]

[[material]]
name = "translucent-orange"
type = "ideal-refraction"
reflectance = [0.98, 0.90, 0.60]
absorbtance = 0.1
ior = 1.55

[[material]]
name = "translucent-black"
type = "ideal-refraction"
reflectance = [0.96, 0.96, 0.95]
absorbtance = 0.5
ior = 1.4

[[mesh]]
name = "bunny"
type = "obj"
path = "models/bunny/bunny.obj"

[[mesh]]
name = "quad"
type = "obj"
path = "models/simple/quad.obj"
"""

WELCOME_TOML = """\
# Hero parity: /root/reference/scenes/welcome-2018.toml (GGX bunny in the
# cbox under an IBL sky, bright off-scene quad light, thin-lens, hdr,
# 2138x1536). HDRI is the procedural Hamarikyu stand-in.
[renderer]
samples = 64
depth = 5
depth-limit = 64
no-direct-emitter = false
threads = 0
integrator = "pt-direct"

[film]
resolution = [2138, 1536]
output = "hdr"
gamma = 2.2
sensitivity = [1, 1, 1]

[sky]
type = "ibl"
path = "models/ibl/hamarikyu.hdr"

[camera]
type = "thin-lens"
fov = 39.3077
focus_distance = 1800
f_number = 1.8
[[camera.transform]]
type = "look-at"
origin = [278, 273, -1600]
target = [278, 273, 0]
up = [0, 1, 0]

[[light]]
type = "area"
object = "light"
emission = [2000, 1540, 1120]

[[object]]
mesh = "bunny"
material = "glossy"
[[object.transform]]
type = "axis-angle"
axis = [0, 1, 0]
angle = 180
[[object.transform]]
type = "scale"
vector = [130, 130, 130]
[[object.transform]]
type = "translate"
vector = [255, -6, 278]

[[object]]
mesh = "cbox"

[[object]]
mesh = "quad"
material = "white"
[[object.transform]]
type = "scale"
vector = [550, 1, 550]
[[object.transform]]
type = "translate"
vector = [278, 1, 278]

[[object]]
mesh = "quad"
material = "white"
[[object.transform]]
type = "scale"
vector = [550, 1, 550]
[[object.transform]]
type = "axis-angle"
axis = [1, 0, 0]
angle = -90
[[object.transform]]
type = "translate"
vector = [278, -550, -272]

[[object]]
name = "light"
mesh = "lightq"
material = "black"
[[object.transform]]
type = "axis-angle"
axis = [1, 0, 0]
angle = 180
[[object.transform]]
type = "scale"
vector = [100, 1, 100]
[[object.transform]]
type = "translate"
vector = [1700, 2500, -1000]

[[material]]
name = "white"
type = "lambert"
albedo = [0.740063, 0.742313, 0.733934]

[[material]]
name = "glossy"
type = "ggx"
reflectance = [1.0, 1.0, 1.0]
roughness = 0.8
ior = 100000

[[material]]
name = "black"
type = "lambert"
albedo = [0, 0, 0]

[[mesh]]
name = "bunny"
type = "obj"
path = "models/bunny/bunny.obj"

[[mesh]]
name = "cbox"
type = "obj"
path = "models/simple/cbox.obj"

[[mesh]]
name = "quad"
type = "obj"
path = "models/simple/quad.obj"

[[mesh]]
name = "lightq"
type = "obj"
path = "models/simple/cbox_luminaire.obj"
"""


def make_hero_scenes(root: Path):
    (root / "ridaisai.toml").write_text(RIDAISAI_TOML)
    (root / "welcome.toml").write_text(WELCOME_TOML)


def main(out_dir: str = "assets") -> None:
    root = Path(out_dir)
    models = root / "models"
    make_cbox(models)
    n = make_bunny_substitute(models)
    nl = make_lamp_sphere(models)
    make_ibl(models)
    make_hero_ibls(models)
    make_hero_scenes(root)
    print(
        f"assets written to {root} (bunny substitute: {n} tris, "
        f"lamp sphere: {nl} tris)"
    )


if __name__ == "__main__":
    main(*sys.argv[1:])
