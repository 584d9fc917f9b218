"""Observability: structured render telemetry + profiler integration.

SURVEY §5.5: the reference only println!s coarse wall-clock. Here every
render can report structured metrics (rays/s, per-bounce wavefront
occupancy, stage survival) and wrap itself in a `jax.profiler` trace for
per-kernel inspection.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class RenderTelemetry:
    events: list = field(default_factory=list)

    def log(self, event: str, **fields):
        rec = {"ts": time.time(), "event": event, **fields}
        self.events.append(rec)
        print(json.dumps(rec), file=sys.stderr)

    def summary(self) -> dict:
        out: dict = {}
        for e in self.events:
            if e["event"] == "chunk":
                out.setdefault("chunks", 0)
                out["chunks"] += 1
                out["rays"] = out.get("rays", 0.0) + e["rays"]
                out["seconds"] = out.get("seconds", 0.0) + e["seconds"]
        if out.get("seconds"):
            out["rays_per_second"] = out["rays"] / out["seconds"]
        return out


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """Wrap a render in a jax.profiler trace (TensorBoard-compatible)."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def bounce_occupancy(scene, settings, o, d, lane, seed, max_bounces=None):
    """Instrumented trace: per-bounce live-lane counts (wavefront occupancy
    / queue density — the quantity compaction manages). Debug tool; runs
    the plain (uncompacted) loop."""
    from ..integrator.wavefront import make_bounce_step, PathState

    n = o.shape[0]
    mb = max_bounces or settings.max_bounces
    state = PathState(
        bounce=jnp.int32(0),
        o=o,
        d=d,
        throughput=jnp.ones((n, 3), o.dtype),
        accum=jnp.zeros((n, 3), o.dtype),
        alive=jnp.ones((n,), bool),
        rays_traced=jnp.float32(0.0),
        lane=jnp.asarray(lane, jnp.uint32),
    )
    step = make_bounce_step(scene, settings, seed)

    def scan_step(s, _):
        s2 = step(s)
        return s2, jnp.sum(s2.alive.astype(jnp.int32))

    _, occupancy = jax.lax.scan(scan_step, state, None, length=mb)
    return np.asarray(occupancy)
