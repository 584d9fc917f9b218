"""One JAX process of a 2-process CPU 'multi-host' cluster.

Spawned by tests/test_multihost.py with LLR_COORDINATOR / LLR_NUM_PROCESSES /
LLR_PROCESS_ID env vars. Proves the `parallel.shard` path — the same
`make_mesh` + `shard_map` + psum code used on a single process — spans
processes through `jax.distributed.initialize` (SURVEY §2.2, §5.8: the
TPU-native stand-in for the reference's single-process mpsc aggregation,
`main.rs:60-132`). On real hardware the identical wiring rides ICI within a
slice and DCN across hosts.

Not a test module itself (no `test_` prefix); all side effects live in
main() so the constant below can be imported by the parent test.
"""

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# Small scene: mirrors tests/test_render.py's NEE_SCENE shape (sphere lamp +
# floor + ball, pt-direct) so the multi-process film exercises NEE + shadow
# rays, not just camera rays.
SCENE = """
[renderer]
samples = 16
integrator = "pt-direct"
depth = 5
depth-limit = 64

[film]
resolution = [24, 24]
output = "png"

[sky]
type = "uniform"
color = [0, 0, 0]

[camera]
type = "ideal-pinhole"
fov = 60
[[camera.transform]]
type = "look-at"
origin = [0, 1, 4]
target = [0, 1, 0]
up = [0, 1, 0]

[[light]]
type = "area"
object = "lamp"
emission = [12, 10, 8]

[[object]]
name = "lamp"
mesh = "ball"
material = "black"
[[object.transform]]
type = "translate"
vector = [0, 3.2, 0]

[[object]]
mesh = "floor"
material = "white"
[[object.transform]]
type = "translate"
vector = [0, -1000, 0]

[[object]]
mesh = "ball"
material = "gray"
[[object.transform]]
type = "translate"
vector = [0.8, 0.6, 0]

[[material]]
name = "black"
type = "lambert"
albedo = [0, 0, 0]

[[material]]
name = "white"
type = "lambert"
albedo = [0.8, 0.8, 0.8]

[[material]]
name = "gray"
type = "lambert"
albedo = [0.5, 0.5, 0.5]

[[mesh]]
name = "ball"
type = "sphere"
radius = 0.6

[[mesh]]
name = "floor"
type = "sphere"
radius = 1000
"""

SEED = 5
N_DEVICES = 8  # global: 2 processes x 4 virtual CPU devices
SPP_PER_DEVICE = 2


def main() -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, str(REPO))

    import jax

    jax.config.update("jax_platforms", "cpu")

    from lumillyrender_tpu.parallel.shard import (
        init_distributed,
        render_sharded,
    )
    from lumillyrender_tpu.scene.compiler import compile_scene
    from lumillyrender_tpu.scene.loader import parse_config

    assert init_distributed(), "LLR_COORDINATOR env not set"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4
    assert jax.device_count() == N_DEVICES

    compiled = compile_scene(parse_config(SCENE))
    result = render_sharded(
        compiled, seed=SEED, n_devices=N_DEVICES,
        spp_per_device=SPP_PER_DEVICE,
    )

    if jax.process_index() == 0:
        import numpy as np

        np.save(os.environ["LLR_TEST_OUT"], result.film)


if __name__ == "__main__":
    main()
