"""Measure per-chip hardware ceilings + achieved renderer throughput.

Establishes the speed-of-light denominators for BASELINE.md's roofline
table (BASELINE.json: "forward and backward kernels profiled at
speed-of-light per chip"):

  * VPU f32 elementwise FLOP/s   (fused mul-add chain on a resident array)
  * MXU f32 / bf16 matmul FLOP/s (square matmul)
  * HBM bandwidth                (big copy: read + write)

Then derives the achieved fraction for the renderer's hot stages from
analytic op counts (the intersection math has a fixed, known FLOP/byte
profile: everything is resident, so the ceiling is the VPU).

Run ON TPU: python tools/roofline.py [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp


def _force(x):
    """block_until_ready is unreliable over the axon tunnel; a scalar
    device->host transfer is a hard sync."""
    return float(jnp.asarray(x).ravel()[0])


def dispatch_overhead():
    """Round-trip cost of one tiny jitted call over the tunnel (subtracted
    from every measurement; single-call work must dwarf it regardless)."""

    @jax.jit
    def f(x):
        return x + 1.0

    x = jnp.zeros((), jnp.float32)
    x = f(x)
    _force(x)
    t0 = time.monotonic()
    for _ in range(10):
        x = f(x)
        _force(x)
    return (time.monotonic() - t0) / 10


_DISPATCH = None


def _timeit(fn, x, iters=4, warmup=2):
    """Time one jitted call of `fn` (which must loop internally so device
    work >> dispatch overhead), chained, hard-synced, dispatch-corrected."""
    global _DISPATCH
    if _DISPATCH is None:
        _DISPATCH = dispatch_overhead()
    for _ in range(warmup):
        x = fn(x)
    _force(x)
    t0 = time.monotonic()
    for _ in range(iters):
        x = fn(x)
        _force(x)
    per_call = (time.monotonic() - t0) / iters - _DISPATCH
    return max(per_call, 1e-9)


def vpu_flops():
    """FMA chain on a resident array: ~pure VPU issue rate. ~17 GFLOP/call
    so tunnel dispatch (~ms) is noise."""
    n = 4 * 1024 * 1024
    depth = 2048

    @jax.jit
    def f(x):
        def body(_, a):
            for _ in range(32):
                a = a * 1.0000001 + 1e-9  # 2 flops/element
            return a

        return jax.lax.fori_loop(0, depth // 32, body, x)

    dt = _timeit(f, jnp.ones((n,), jnp.float32))
    return 2.0 * depth * n / dt


def mxu_flops(dtype):
    m = 4096
    reps = 16  # 2.2 TFLOP/call

    @jax.jit
    def f(a):
        def body(_, a):
            return (jnp.dot(a, a, preferred_element_type=jnp.float32)
                    * (1.0 / m)).astype(dtype)

        return jax.lax.fori_loop(0, reps, body, a)

    dt = _timeit(f, jnp.ones((m, m), dtype))
    return reps * 2.0 * m * m * m / dt


def hbm_bw():
    n = 64 * 1024 * 1024  # 256 MB f32 — far beyond VMEM
    reps = 20  # ~10 GB traffic/call

    @jax.jit
    def f(x):
        def body(_, a):
            return a * 1.0000001

        return jax.lax.fori_loop(0, reps, body, x)

    dt = _timeit(f, jnp.ones((n,), jnp.float32))
    return reps * 2.0 * 4.0 * n / dt  # read + write bytes


def transcendental_rate():
    """exp throughput (sky/BSDF stages use exp/pow/trig)."""
    n = 4 * 1024 * 1024
    depth = 512

    @jax.jit
    def f(x):
        def body(_, a):
            for _ in range(16):
                a = jnp.exp(a * 1e-9)
            return a

        return jax.lax.fori_loop(0, depth // 16, body, x)

    dt = _timeit(f, jnp.ones((n,), jnp.float32))
    return depth * n / dt  # transcendentals per second


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    # persistent compile cache: first-compiles over the tunnel are minutes
    cache_dir = REPO / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    dev = jax.devices()[0]
    out = {"device": str(dev)}
    print(f"{'device':24s} {dev}", flush=True)

    def meas(name, fn):
        v = fn()
        out[name] = v
        print(f"{name:24s} {v:.3e}", flush=True)
        if args.json:
            Path(args.json).write_text(json.dumps(out, indent=2))

    meas("dispatch_overhead_s", dispatch_overhead)
    meas("vpu_f32_flops", vpu_flops)
    meas("hbm_bytes_per_s", hbm_bw)
    meas("transcendentals_per_s", transcendental_rate)
    meas("mxu_f32_flops", lambda: mxu_flops(jnp.float32))
    meas("mxu_bf16_flops", lambda: mxu_flops(jnp.bfloat16))


if __name__ == "__main__":
    main()
