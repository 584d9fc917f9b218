"""Checkpoint/resume for long renders.

New capability over the reference (SURVEY §5.4: a crash loses the whole
render there). Counter-based RNG makes resuming exact: the film SUM and the
number of completed samples are the entire state — the next chunk's lanes
derive their streams from (seed, global sample index) and reproduce exactly
what an uninterrupted render would have computed.
"""

from __future__ import annotations

import json
from dataclasses import asdict
from pathlib import Path

import numpy as np

FORMAT_VERSION = 1


def save(path, film_sum: np.ndarray, samples_done: int, seed: int,
         settings, total_rays: float) -> None:
    path = Path(path)
    tmp = path.with_suffix(path.suffix + ".tmp")
    meta = dict(
        version=FORMAT_VERSION,
        samples_done=int(samples_done),
        seed=int(seed),
        total_rays=float(total_rays),
        settings=asdict(settings),
    )
    with open(tmp, "wb") as f:  # file handle: numpy won't append ".npz"
        np.savez_compressed(f, film_sum=film_sum, meta=json.dumps(meta))
    tmp.replace(path)  # atomic on POSIX: a crash never corrupts a checkpoint


def load(path, settings, seed: int):
    """Returns (film_sum, samples_done, total_rays) or None if absent or
    incompatible with the requested render."""
    path = Path(path)
    if not path.exists():
        return None
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        if meta.get("version") != FORMAT_VERSION:
            return None
        if meta["seed"] != seed:
            return None
        saved = meta["settings"]
        current = asdict(settings)
        # spp may differ (user can extend a render); all else must match.
        for k, v in current.items():
            if k != "spp" and saved.get(k) != v:
                return None
        return (
            np.asarray(z["film_sum"], np.float32),
            int(meta["samples_done"]),
            float(meta["total_rays"]),
        )
