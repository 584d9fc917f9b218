"""Probe which Mosaic/Pallas-TPU primitives compile on this chip.

Each probe is compiled and executed in isolation; failures print the
exception head instead of aborting, so one run maps the capability surface
(per-lane gathers are the make-or-break feature for BVH traversal).

Run: python tools/pallas_probe.py
"""

from __future__ import annotations

import sys
import traceback

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, S, L = 2048, 8, 128  # table rows, sublanes, lanes


def probe(name):
    def deco(fn):
        try:
            out = fn()
            jax.block_until_ready(out)
            print(f"OK    {name}: {jnp.asarray(out).ravel()[:3]}")
        except Exception as e:  # noqa: BLE001
            lines = str(e).splitlines() or [""]
            print(f"FAIL  {name}: {type(e).__name__}: {lines[0][:160]}")
        return fn

    return deco


def run(kernel, out_shape, *args, scratch=()):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(scratch),
    )(*args)


def main():
    table = jnp.arange(M * L, dtype=jnp.float32).reshape(M, L)
    table8 = jnp.arange(M * 8, dtype=jnp.float32).reshape(M, 8)
    idx = (jnp.arange(S * L, dtype=jnp.int32).reshape(S, L) * 7) % M
    idx_flat = (jnp.arange(L, dtype=jnp.int32) * 13) % M

    @probe("take_along_axis axis0 full-shape (M,L)[idx (M,L)]")
    def _():
        idx_full = (jnp.arange(M, dtype=jnp.int32)[:, None] * 7 + jnp.arange(L)[None, :]) % M

        def k(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((M, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx_full)

    @probe("take_along_axis axis1 lane-lookup (S,L)[idx (S,L)]")
    def _():
        def k(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:] % L, axis=1)

        return run(
            k, jax.ShapeDtypeStruct((S, L), jnp.float32), table[:S], idx
        )

    @probe("jnp.take axis0 rowgather (M,8)[idx (L,)]")
    def _():
        def k(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.take(t_ref[:], i_ref[:], axis=0)

        return run(k, jax.ShapeDtypeStruct((L, 8), jnp.float32), table8, idx_flat)

    @probe("vmem scalar dynamic read t_ref[i, 0]")
    def _():
        def k(t_ref, i_ref, o_ref):
            def body(j, acc):
                return acc + t_ref[i_ref[0, j], 0]

            o_ref[0, 0] = jax.lax.fori_loop(0, 4, body, 0.0)

        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(table8, idx.reshape(1, -1)[:, :L])

    @probe("ref ds-row read t_ref[pl.ds(i,1), :] (scalar from SMEM)")
    def _():
        def k(i_ref, t_ref, o_ref):
            row = t_ref[pl.ds(i_ref[0], 1), :]
            o_ref[:] = jnp.broadcast_to(row, (S, 8))

        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((S, 8), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.array([5], jnp.int32), table8)

    @probe("one-hot matmul gather (S*L onehot @ table8)")
    def _():
        def k(t_ref, i_ref, o_ref):
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (L, M), 1)
                == i_ref[:].reshape(L, 1)
            ).astype(jnp.float32)
            o_ref[:] = jnp.dot(oh, t_ref[:], preferred_element_type=jnp.float32)

        return run(
            k, jax.ShapeDtypeStruct((L, 8), jnp.float32), table8, idx_flat
        )

    @probe("pltpu.prng_random_bits (S,L)")
    def _():
        def k(seed_ref, o_ref):
            pltpu.prng_seed(seed_ref[0])
            bits = pltpu.bitcast(pltpu.prng_random_bits((S, L)), jnp.int32)
            o_ref[:] = (bits >> 8).astype(jnp.float32)

        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.array([42], jnp.int32))

    @probe("while_loop with vector state in kernel")
    def _():
        def k(t_ref, o_ref):
            def cond(s):
                i, _ = s
                return i < 10

            def body(s):
                i, acc = s
                return i + 1, acc + t_ref[0:S, :]

            _, acc = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.zeros((S, L), jnp.float32))
            )
            o_ref[:] = acc

        return run(k, jax.ShapeDtypeStruct((S, L), jnp.float32), table)

    @probe("scatter-add o_ref[idx] += v (per-lane)")
    def _():
        def k(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.zeros_like(o_ref)
            upd = jnp.zeros((M, L), jnp.float32).at[i_ref[:], 0].add(1.0)
            o_ref[:] = upd[:S, :]

        return run(k, jax.ShapeDtypeStruct((S, L), jnp.float32), table, idx)

    @probe("packet-walk core: SMEM cursor while_loop + dyn-slice + any()")
    def _():
        # The exact primitive mix the packet BVH traversal needs: a scalar
        # cursor in a while_loop, scalar-indexed dynamic_slice node fetch
        # from a VMEM table, a dense (S,L) test, an any() reduce driving the
        # cursor update.
        def k(t_ref, o_ref):
            def cond(s):
                cursor, _ = s
                return cursor >= 0

            def body(s):
                cursor, acc = s
                row = t_ref[pl.ds(cursor, 1), :]
                hit = jnp.any(row > 0.5 * jnp.float32(M * L))
                acc = acc + jnp.broadcast_to(row, (S, L))
                nxt = jax.lax.select(hit, cursor + 7, cursor + 1)
                return jnp.where(nxt >= M, -1, nxt), acc

            _, acc = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.zeros((S, L), jnp.float32))
            )
            o_ref[:] = acc

        return run(k, jax.ShapeDtypeStruct((S, L), jnp.float32), table)

    @probe("wide 2D ops (16, 256) + argmin")
    def _():
        def k(t_ref, o_ref):
            x = t_ref[:]
            j = jnp.argmin(x, axis=0).astype(jnp.float32)
            o_ref[:] = (jnp.min(x, axis=0) + j).reshape(1, 256)

        return run(
            k,
            jax.ShapeDtypeStruct((1, 256), jnp.float32),
            jnp.arange(16 * 256, dtype=jnp.float32).reshape(16, 256),
        )

    @probe("scalar broadcast from VMEM element t_ref[i, j]")
    def _():
        def k(i_ref, t_ref, o_ref):
            v = t_ref[i_ref[0], 3]
            o_ref[:] = jnp.full((S, L), v)

        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.array([5], jnp.int32), table8)

    @probe("dynamic ROW+LANE scalar read t_ref[i, j] (both traced)")
    def _():
        def k(i_ref, t_ref, o_ref):
            a = i_ref[0]
            b = i_ref[1]
            o_ref[:] = jnp.full((S, L), t_ref[a, b])

        return pl.pallas_call(
            k,
            out_shape=jax.ShapeDtypeStruct((S, L), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.array([3, 77], jnp.int32), table)

    @probe("while_loop(scalar carry) mutating out_ref via pl.when")
    def _():
        def k(t_ref, o_ref):
            o_ref[:] = jnp.zeros((S, L), jnp.float32)

            def cond(c):
                return c < 20

            def body(c):
                row = t_ref[pl.ds(c % M, 1), :]
                hit = jnp.any(row > -1.0)

                @pl.when(hit & (c % 2 == 0))
                def _():
                    o_ref[:] = o_ref[:] + jnp.broadcast_to(row, (S, L))

                return c + 1

            jax.lax.while_loop(cond, body, jnp.int32(0))

        return run(k, jax.ShapeDtypeStruct((S, L), jnp.float32), table)

    @probe("int32 bit ops (threefry core)")
    def _():
        def k(t_ref, o_ref):
            x = t_ref[:].astype(jnp.int32)
            u = pltpu.bitcast(x, jnp.uint32)
            u = (u << 13) | (u >> 19)
            o_ref[:] = pltpu.bitcast(u >> 8, jnp.int32).astype(jnp.float32)

        return run(k, jax.ShapeDtypeStruct((S, L), jnp.float32), table[:S])


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    main()
