"""Empirical Mosaic capability probe for the BVH kernel access patterns.

Answers, on the real TPU toolchain:
  1. scalar read from VMEM at (dynamic sublane, STATIC lane)?
  2. scalar read from VMEM at (dynamic sublane, dynamic lane)?  [expected NO]
  3. SMEM input array with fully dynamic scalar reads — and how big can it be?
  4. fori_loop-carried dynamic scalar reads driving lax control flow.
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        out = fn()
        print(f"{name}: OK {np.asarray(out).ravel()[:4]}", flush=True)
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


def probe_vmem_dyn_sublane_static_lane():
    def kernel(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            r = idx_ref[0, i]
            return acc + tab_ref[r, 5]  # dynamic sublane, static lane

        out_ref[0, 0] = jax.lax.fori_loop(0, 16, body, jnp.float32(0.0))

    tab = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    idx = jnp.arange(16, dtype=jnp.int32).reshape(1, 16)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(tab, idx)


def probe_vmem_dyn_lane():
    def kernel(tab_ref, idx_ref, out_ref):
        r = idx_ref[0, 0]
        out_ref[0, 0] = tab_ref[3, r]  # dynamic LANE index

    tab = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    idx = jnp.array([[7]], dtype=jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(tab, idx)


def probe_smem_input(rows):
    def kernel(tab_ref, out_ref):
        def body(i, acc):
            return acc + tab_ref[(i * 977) % rows, i % 8]

        out_ref[0, 0] = jax.lax.fori_loop(0, 64, body, jnp.float32(0.0))

    tab = jnp.arange(rows * 8, dtype=jnp.float32).reshape(rows, 8)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(tab)


def probe_while_walk_smem():
    """Node-walk shape: while_loop with SMEM-driven link following plus a
    vector update predicated on the scalar."""

    def kernel(links_ref, rays_ref, out_ref):
        out_ref[:] = rays_ref[:]

        def body(cur):
            nxt = links_ref[cur, 0]

            @pl.when(nxt >= 0)
            def _():
                out_ref[:] = out_ref[:] + jnp.float32(cur)

            return nxt

        jax.lax.while_loop(lambda c: c >= 0, body, jnp.int32(0))

    links = jnp.concatenate(
        [jnp.arange(1, 100, dtype=jnp.int32), jnp.array([-1], jnp.int32)]
    ).reshape(100, 1)
    rays = jnp.ones((8, 128), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(links, rays)


if __name__ == "__main__":
    run("vmem dyn-sublane static-lane", probe_vmem_dyn_sublane_static_lane)
    run("vmem dyn-lane", probe_vmem_dyn_lane)
    for rows in (1024, 8192, 32768, 131072):
        run(f"smem input ({rows}x8 = {rows*32//1024} KiB)",
            functools.partial(probe_smem_input, rows))
    run("while-walk smem links + vector update", probe_while_walk_smem)
