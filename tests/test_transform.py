"""Matrix/transform semantics parity (`matrix4.rs`, `scene_loader.rs:88-104`)."""

import numpy as np

from lumillyrender_tpu.scene import transform as xf


def test_translate_point():
    m = xf.translate((1.0, 2.0, 3.0))
    assert np.allclose(xf.apply_point(m, np.array([1.0, 1.0, 1.0])), [2, 3, 4])


def test_scale_point():
    m = xf.scale((2.0, 3.0, 4.0))
    assert np.allclose(xf.apply_point(m, np.array([1.0, 1.0, 1.0])), [2, 3, 4])


def test_axis_angle_rotation():
    m = xf.axis_angle((0.0, 1.0, 0.0), 90.0)
    # Rotating +x by 90 deg around +y gives -z (right-handed).
    assert np.allclose(xf.apply_point(m, np.array([1.0, 0.0, 0.0])), [0, 0, -1], atol=1e-6)


def test_look_at_quirk():
    """look_at stores basis in rows / origin in row 3 (quirk #17): points
    transform as R^T.v with no translation; cameras read row(3)."""
    m = xf.look_at((278.0, 273.0, -800.0), (278.0, 273.0, 0.0), (0.0, 1.0, 0.0))
    assert np.allclose(xf.row3(m), [278, 273, -800])
    forward, right, up = xf.basis(m)
    # Camera at z=-800 looking toward +z (camera.rs new/forward).
    assert np.allclose(forward, [0, 0, 1], atol=1e-6)
    assert np.allclose(up, [0, 1, 0], atol=1e-6)
    # Translation does NOT apply to points through look_at.
    p = xf.apply_point(m, np.zeros(3))
    assert np.allclose(p, 0.0)


def test_compose_order():
    """List order == application order (fold right-to-left,
    scene_loader.rs:101-103): scale then translate."""
    m = xf.compose(
        [
            {"type": "scale", "vector": (2.0, 2.0, 2.0)},
            {"type": "translate", "vector": (1.0, 0.0, 0.0)},
        ]
    )
    assert np.allclose(xf.apply_point(m, np.array([1.0, 1.0, 1.0])), [3, 2, 2])


def test_sample_scene_bunny_transform():
    """sample.toml bunny: rotate 180 about y, scale 130, translate."""
    m = xf.compose(
        [
            {"type": "axis-angle", "axis": (0.0, 1.0, 0.0), "angle": 180.0},
            {"type": "scale", "vector": (130.0, 130.0, 130.0)},
            {"type": "translate", "vector": (255.0, -6.0, 278.0)},
        ]
    )
    p = xf.apply_point(m, np.array([0.1, 0.1, 0.0]))
    # rotate: (-0.1, 0.1, 0); scale: (-13, 13, 0); translate: (242, 7, 278)
    assert np.allclose(p, [242, 7, 278], atol=1e-4)
