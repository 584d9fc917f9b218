"""Test configuration: force an 8-device virtual CPU mesh.

The axon TPU plugin overrides JAX_PLATFORMS, so the platform must be forced
through jax.config *before* backend initialization — hence this executes at
conftest import time, ahead of any jax usage in tests.
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

REPO = Path(__file__).resolve().parents[1]
ASSETS = REPO / "assets"
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def assets_dir() -> Path:
    if not (ASSETS / "models" / "simple" / "cbox.obj").exists():
        import subprocess

        subprocess.run(
            [sys.executable, str(REPO / "tools" / "make_assets.py"), str(ASSETS)],
            check=True,
        )
    return ASSETS
