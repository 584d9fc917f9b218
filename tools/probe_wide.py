"""Mosaic capability probe for the wide-leaf BVH kernel's access patterns.

The wide kernel (ops/pallas_bvh_wide.py) puts TRIANGLES on lanes and only
SUB rays on sublanes, so it needs lowering shapes the packet kernel never
used. Answers, on the real TPU toolchain:
  1. (1, 128) VECTOR row read at a DYNAMIC sublane index inside while_loop.
  2. Narrow-lane output blocks: BlockSpec (8, 8) writes.
  3. Lane reduction (min keepdims) + broadcast back to (8, 128).
  4. Building an (8, 128) tile from 8 scalars via masked row-iota.
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

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
        msg = str(e).split("\n")[0][:220]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)


def probe_dyn_row_vector_read():
    def kernel(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            r = idx_ref[0, i]
            row = tab_ref[pl.ds(r, 1), :]  # (1,128) @ dynamic sublane
            return acc + row

        out_ref[:, :] = jax.lax.fori_loop(
            0, 8, body, jnp.zeros((1, 128), jnp.float32)
        )

    tab = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    idx = jnp.arange(8, dtype=jnp.int32).reshape(1, 8) * 7
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)


def probe_narrow_out_block():
    def kernel(x_ref, out_ref):
        out_ref[:, :] = x_ref[:, :8] + 1.0

    x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
    return pl.pallas_call(
        kernel,
        grid=(2,),
        out_shape=jax.ShapeDtypeStruct((16, 8), jnp.float32),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x)


def probe_lane_min_broadcast():
    def kernel(x_ref, out_ref):
        m = jnp.min(x_ref[:, :], axis=1, keepdims=True)  # (8,1)
        out_ref[:, :] = jnp.broadcast_to(m, (8, 128))

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def probe_scalar_row_fill():
    def kernel(r_ref, out_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        acc = jnp.zeros((8, 128), jnp.float32)
        for r in range(8):
            acc = jnp.where(rows == r, r_ref[r, 0], acc)
        out_ref[:, :] = acc

    r = jnp.tile(
        jnp.arange(8, dtype=jnp.float32).reshape(8, 1) * 10, (1, 8)
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(r)


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    run("1 dyn-row (1,128) vector read", probe_dyn_row_vector_read)
    run("2 narrow (8,8) out block", probe_narrow_out_block)
    run("3 lane min+broadcast", probe_lane_min_broadcast)
    run("4 scalar row fill", probe_scalar_row_fill)
