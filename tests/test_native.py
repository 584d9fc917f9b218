"""Native C++ SAH builder: exact topology parity with the numpy oracle."""

import numpy as np
import pytest

from lumillyrender_tpu.accel import sah

native = pytest.importorskip("lumillyrender_tpu.accel.native")

if not native.available():  # no toolchain -> numpy fallback covers us
    pytest.skip("native builder unavailable", allow_module_level=True)


@pytest.mark.parametrize("seed", range(5))
def test_exact_parity_random(seed):
    rng = np.random.default_rng(seed)
    p = int(rng.integers(1, 500))
    mins = rng.normal(size=(p, 3)) * 3
    maxs = mins + rng.random((p, 3))
    cent = (mins + maxs) / 2
    a = sah.build(mins, maxs, cent)
    b = native.build(mins, maxs, cent)
    assert np.array_equal(a.node_leaf, b.node_leaf)
    assert np.array_equal(a.node_miss, b.node_miss)
    assert np.allclose(a.node_min, b.node_min, atol=1e-6)
    assert np.allclose(a.node_max, b.node_max, atol=1e-6)


def test_exact_parity_with_ties():
    """Exact centroid ties (regular grid) must not diverge: both builders
    sort every axis from the node's incoming order with a stable sort."""
    g = np.stack(
        np.meshgrid(np.arange(4.0), np.arange(4.0), np.arange(4.0)), -1
    ).reshape(-1, 3)
    mins = g
    maxs = g + 1.0
    cent = (mins + maxs) / 2
    a = sah.build(mins, maxs, cent)
    b = native.build(mins, maxs, cent)
    assert np.array_equal(a.node_leaf, b.node_leaf)
    assert np.array_equal(a.node_miss, b.node_miss)


def test_single_prim():
    mins = np.zeros((1, 3))
    maxs = np.ones((1, 3))
    b = native.build(mins, maxs, (mins + maxs) / 2)
    assert b.node_leaf.tolist() == [0]
    assert b.node_miss.tolist() == [-1]
