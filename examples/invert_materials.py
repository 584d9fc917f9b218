"""Inverse rendering example: recover material parameters from an image.

Renders the flagship scene with its true materials to produce a target
film, perturbs the albedos, then runs Adam (optax) over the
detached-sampling differentiable renderer (`diff/render.py`) to recover
them — the "differentiable shading" capability mandated by BASELINE.json's
north star (the Rust reference has no autodiff anywhere).

Runs anywhere JAX runs:
    python examples/invert_materials.py [--steps 60] [--size 64] [--spp 4]

On the CPU backend this takes ~2 minutes at the defaults; on TPU the same
script scales to full resolution. The training step is a single jitted
value_and_grad; swap in `parallel.shard.build_sharded_train_step` to run
it data-parallel over a device mesh.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--lr", type=float, default=5e-2)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    from lumillyrender_tpu.diff.render import (
        DiffParams,
        params_of,
        render_diff,
    )
    from lumillyrender_tpu.scene.compiler import compile_scene_file

    scene_path = REPO / "assets" / "new-cbox.toml"
    if not scene_path.exists():
        import subprocess

        subprocess.run(
            [sys.executable, str(REPO / "tools" / "make_assets.py"),
             str(REPO / "assets")],
            check=True,
        )
    compiled = compile_scene_file(scene_path, spp=args.spp)
    compiled.settings = dataclasses.replace(
        compiled.settings, width=args.size, height=args.size, max_bounces=8
    )
    scene, settings = compiled.data, compiled.settings

    true_params = params_of(scene)
    # Target at 8x the training spp (averaged over seeds): target noise is
    # per-pixel bias the optimizer would otherwise chase.
    target = sum(
        render_diff(scene, settings, true_params, seed=7 + 1000 * i,
                    spp=args.spp)
        for i in range(8)
    ) / 8.0
    target = jax.lax.stop_gradient(target)

    # Perturb only OBSERVABLE albedos: materials that actually receive a
    # gradient from this view (emitters and off-camera rows get none — a
    # parameter with no image influence cannot be recovered by any method).
    def probe_loss(c):
        p = DiffParams(
            materials=dataclasses.replace(true_params.materials, color=c),
            camera=true_params.camera,
            sky=true_params.sky,
        )
        film = render_diff(scene, settings, p, seed=13, spp=args.spp)
        return jnp.mean((film - 0.5) ** 2)

    g0 = jax.grad(probe_loss)(true_params.materials.color)
    observable = np.abs(np.asarray(g0)).sum(axis=1) > 0
    print(f"observable materials: {int(observable.sum())}"
          f"/{observable.shape[0]}")

    rng = np.random.default_rng(0)
    color0 = np.asarray(true_params.materials.color)
    guess = np.where(
        observable[:, None],
        np.clip(color0 * rng.uniform(0.3, 1.7, color0.shape), 0.05, 0.95),
        color0,
    ).astype(np.float32)
    params = DiffParams(
        materials=dataclasses.replace(
            true_params.materials, color=jnp.asarray(guess)
        ),
        camera=true_params.camera,
        sky=true_params.sky,
    )

    opt = optax.adam(
        optax.exponential_decay(args.lr, args.steps, 0.1)
    )
    # Only the material colors are trained; everything else is frozen.
    opt_state = opt.init(params.materials.color)

    @jax.jit
    def train_step(color, opt_state, seed):
        def loss_fn(c):
            p = DiffParams(
                materials=dataclasses.replace(params.materials, color=c),
                camera=params.camera,
                sky=params.sky,
            )
            film = render_diff(scene, settings, p, seed, args.spp)
            return jnp.mean((film - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(color)
        updates, opt_state = opt.update(g, opt_state)
        color = jnp.clip(optax.apply_updates(color, updates), 0.0, 1.0)
        return color, opt_state, loss

    def obs_err(c):
        e = np.abs(np.asarray(c) - color0).max(axis=1)
        return float(e[observable].max())

    color = params.materials.color
    err0 = obs_err(color)
    for i in range(args.steps):
        color, opt_state, loss = train_step(color, opt_state, 100 + i)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:3d}  loss {float(loss):.3e}  "
                  f"max |albedo err| {obs_err(color):.4f}", flush=True)
    err = obs_err(color)
    print(f"initial max albedo error {err0:.4f} -> final {err:.4f}")
    if err < err0 * 0.5:
        print("recovered: error reduced by >2x")
    else:
        print("WARNING: optimization made <2x progress")


if __name__ == "__main__":
    main()
