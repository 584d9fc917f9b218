"""Transform matrices with the reference's exact (quirky) semantics.

Parity: reference `src/math/matrix4.rs` and `src/scene_loader.rs:88-104`.

The reference stores a row-major 4x4 and transforms a point as
``(row_i . (v, 1))`` for i in 0..3, keeping only xyz. Consequences we must
reproduce exactly:

* ``translate``/``scale``/``axis_angle`` put translation in column 3, so
  points transform conventionally (`matrix4.rs:20-55`).
* ``look_at`` stores the camera basis in *rows* 0..2 and the origin in row 3
  (`matrix4.rs:56-68`). Applying it to a point therefore yields ``R^T . v``
  with NO translation; cameras separately read their position from
  ``matrix.row(3)`` (`camera.rs:39,153,373`).
* A transform list composes right-to-left: ``fold(unit, |p, c| c * p)``
  (`scene_loader.rs:101-103`), i.e. list order == application order.

Host-side only (scene compilation); plain numpy, not jax.
"""

from __future__ import annotations

import numpy as np

from ..constants import PI


def identity() -> np.ndarray:
    return np.eye(4, dtype=np.float64)


def translate(v) -> np.ndarray:
    m = identity()
    m[0, 3], m[1, 3], m[2, 3] = v
    return m


def scale(v) -> np.ndarray:
    m = identity()
    m[0, 0], m[1, 1], m[2, 2] = v
    return m


def axis_angle(axis, angle_deg: float) -> np.ndarray:
    """Rodrigues rotation; angle in degrees (`scene_loader.rs:93`)."""
    ax, ay, az = (float(c) for c in axis)
    t = float(angle_deg) * PI / 180.0
    c, s = np.cos(t), np.sin(t)
    m = identity()
    m[:3, :3] = np.array([
        [c + ax * ax * (1 - c), ax * ay * (1 - c) - az * s, ax * az * (1 - c) + ay * s],
        [ay * ax * (1 - c) + az * s, c + ay * ay * (1 - c), ay * az * (1 - c) - ax * s],
        [az * ax * (1 - c) - ay * s, az * ay * (1 - c) + ax * s, c + az * az * (1 - c)],
    ])
    return m


def look_at(origin, target, up) -> np.ndarray:
    """Reference layout: basis vectors in rows, origin in row 3

    (`matrix4.rs:56-68`). Point transforms through this matrix are R^T.v with
    no translation — quirk #17 of SURVEY.md's register.
    """
    origin = np.asarray(origin, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)
    za = origin - target
    za = za / np.linalg.norm(za)
    xa = np.cross(up, za)
    xa = xa / np.linalg.norm(xa)
    ya = np.cross(za, xa)
    m = identity()
    m[0, :3] = xa
    m[1, :3] = ya
    m[2, :3] = za
    m[3, :] = [origin[0], origin[1], origin[2], 1.0]
    # Rows 0..2 keep w = 0 (matches `matrix4.rs:62-65`).
    m[0, 3] = m[1, 3] = m[2, 3] = 0.0
    return m


def from_config(t: dict) -> np.ndarray:
    """One `[[...transform]]` table -> matrix (`scene_loader.rs:88-97`)."""
    kind = t["type"]
    if kind == "translate":
        return translate(t["vector"])
    if kind == "scale":
        return scale(t["vector"])
    if kind == "axis-angle":
        return axis_angle(t["axis"], t["angle"])
    if kind == "look-at":
        return look_at(t["origin"], t["target"], t["up"])
    raise ValueError(f"Unknown transform type `{kind}`")


def compose(transforms: list[dict]) -> np.ndarray:
    """fold right-to-left: result = t_n ... t_2 . t_1 (`scene_loader.rs:101-103`)."""
    m = identity()
    for t in transforms:
        m = from_config(t) @ m
    return m


def apply_point(m: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Reference `M * Vector3`: rows 0..2 dotted with (v, 1) (`matrix4.rs:185-199`).

    Works on a single point (3,) or an array of points (..., 3).
    """
    v = np.asarray(v, dtype=np.float64)
    return v @ m[:3, :3].T + m[:3, 3]


def row3(m: np.ndarray) -> np.ndarray:
    """Camera position extraction: `matrix.row(3)` xyz (`camera.rs:39`)."""
    return m[3, :3].copy()


def basis(m: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(forward, right, up) = M*(0,0,-1), M*(1,0,0), M*(0,1,0) (`camera.rs:41-43`).

    Directions go through `apply_point` too (w=1 with zero translation rows for
    look_at; for translate-composed transforms the reference would add the
    translation into direction vectors — we reproduce that faithfully).
    """
    forward = apply_point(m, np.array([0.0, 0.0, -1.0]))
    right = apply_point(m, np.array([1.0, 0.0, 0.0]))
    up = apply_point(m, np.array([0.0, 1.0, 0.0]))
    return forward, right, up
