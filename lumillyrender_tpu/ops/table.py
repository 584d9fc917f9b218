"""Dense small-table row selection.

TPU per-lane gathers (`jnp.take` with a traced index vector) lower to a
serial gather loop that runs far below VPU streaming rate — the ablation
(tools/ablate.py) showed `shade_point`'s gathers costing ~3x the entire
intersection math. For the small tables a renderer actually gathers from
per bounce (materials: a handful of rows; lights: a few emitters; sphere
tables) a one-hot compare-and-sum is dramatically faster: M compare+select
rows over N dense lanes, fully vectorized, no serialization.

It is also the better *backward* form: the VJP of compare-sum is a dense
masked reduction instead of a scatter-add, which matters for the
differentiable material table (`diff/render.py`).

Tables larger than `DENSE_MAX` rows (e.g. 82k-triangle meshes) fall back to
`jnp.take`.
"""

from __future__ import annotations

import jax.numpy as jnp

DENSE_MAX = 192


def take_rows(table, idx):
    """Rows of `table` ((M,) or (M, C)) at `idx` (int array). Dense one-hot
    path for small M; `jnp.take` otherwise. idx is clamped to [0, M) here so
    both paths agree on out-of-range semantics (the one-hot path would
    otherwise return zero rows while jnp.take clamps)."""
    m = table.shape[0]
    idx = jnp.clip(idx, 0, m - 1)
    if m > DENSE_MAX:
        return jnp.take(table, idx, axis=0)
    shape = idx.shape
    if len(shape) != 1:
        idx = idx.reshape(-1)
    rows = jnp.arange(m, dtype=jnp.int32)
    oh = idx[None, :] == rows[:, None]  # (M, N)
    if table.ndim == 1:
        out = jnp.sum(jnp.where(oh, table[:, None], 0), axis=0)
        return out.reshape(shape) if len(shape) != 1 else out
    # (M, C): per-component select keeps every intermediate lane-dense
    # ((M, N) with N on the 128-wide lane axis), never a size-C minor dim.
    outs = [
        jnp.sum(jnp.where(oh, table[:, c][:, None], 0), axis=0)
        for c in range(table.shape[1])
    ]
    out = jnp.stack(outs, axis=-1)
    return out.reshape(shape + table.shape[1:]) if len(shape) != 1 else out
