"""Scene-description parsing parity.

The reference's own scene files (read-only at /root/reference/scenes) are
used as *input data* to prove TOML compatibility (`scene_loader.rs` schema).
"""

from pathlib import Path

import pytest

from lumillyrender_tpu.scene.loader import load_config, parse_config

REF_SCENES = Path("/root/reference/scenes")


@pytest.mark.parametrize("name", [p.name for p in sorted(REF_SCENES.glob("*.toml"))])
def test_parses_reference_scene(name):
    cfg = load_config(REF_SCENES / name)
    assert cfg.renderer.samples > 0
    assert cfg.film.resolution[0] > 0
    assert cfg.camera.type in ("ideal-pinhole", "thin-lens", "omnidirectional")


def test_reference_defaults():
    cfg = parse_config(
        """
[renderer]
samples = 4

[film]
resolution = [8, 8]
output = "png"

[camera]
type = "ideal-pinhole"
fov = 45.0
"""
    )
    # Defaults from description.rs:75-79 and main.rs:66,136.
    assert cfg.renderer.depth == 5
    assert cfg.renderer.depth_limit == 64
    assert cfg.renderer.no_direct_emitter is False
    assert cfg.renderer.integrator == "pt-direct"
    assert cfg.film.gamma == 2.2
    assert cfg.sky is None


def test_light_emission_join():
    cfg = load_config(REF_SCENES / "new-cbox.toml")
    descs = cfg.object_descriptors()
    lights = [d for d in descs if d.emission is not None]
    assert len(lights) == 1
    # emission * intensity (scene_loader.rs:254-262): intensity = 0.7.
    assert lights[0].emission[0] == pytest.approx(40.0 * 0.7)


def test_kebab_and_snake_case():
    # welcome-2018.toml uses snake_case focus_distance; we accept both.
    cfg = load_config(REF_SCENES / "welcome-2018.toml")
    assert cfg.camera.type == "thin-lens"
    assert cfg.camera.focus_distance == 1800.0


def test_material_enum_parsing():
    cfg = load_config(REF_SCENES / "ridaisai-2018.toml")
    kinds = {m.type for m in cfg.materials}
    assert "ideal-refraction" in kinds
    glass = [m for m in cfg.materials if m.type == "ideal-refraction"][0]
    assert glass.ior > 1.0
