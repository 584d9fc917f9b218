"""Multi-host (multi-process) execution gate.

Spawns TWO separate Python processes, each owning 4 virtual CPU devices,
joined into one 8-device cluster via `jax.distributed.initialize`
(`parallel.shard.init_distributed`). The cross-process film must match the
single-process 8-device film: the `shard_map` DP code is process-count
-invariant (sample offsets are global ids; the psum spans the global mesh).

This is the CPU-mesh stand-in for the N>=2-hosts scaling gate (BASELINE.md
"Scaling note"): correctness across a real process boundary, with the
scaling *efficiency* measurement deferred to real multi-chip hardware.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

import multihost_worker  # rootdir-mode pytest puts tests/ on sys.path

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_render_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "film.npy"
    procs = []
    logs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
        env.update(
            LLR_COORDINATOR=f"127.0.0.1:{port}",
            LLR_NUM_PROCESSES="2",
            LLR_PROCESS_ID=str(pid),
            LLR_TEST_OUT=str(out),
        )
        log = open(tmp_path / f"worker{pid}.log", "w")
        logs.append(log)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(REPO / "tests" / "multihost_worker.py")],
                env=env,
                stdout=log,
                stderr=subprocess.STDOUT,
                cwd=str(REPO),
            )
        )
    try:
        for p in procs:
            assert p.wait(timeout=600) == 0, (
                (tmp_path / "worker0.log").read_text()
                + (tmp_path / "worker1.log").read_text()
            )
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()

    film_2proc = np.load(out)

    # Single-process oracle on this process's own 8-device CPU mesh: the
    # same global mesh shape, same seed/offsets -> same estimator.
    from lumillyrender_tpu.parallel.shard import render_sharded
    from lumillyrender_tpu.scene.compiler import compile_scene
    from lumillyrender_tpu.scene.loader import parse_config

    compiled = compile_scene(parse_config(multihost_worker.SCENE))
    r1 = render_sharded(
        compiled,
        seed=multihost_worker.SEED,
        n_devices=multihost_worker.N_DEVICES,
        spp_per_device=multihost_worker.SPP_PER_DEVICE,
    )
    assert np.abs(film_2proc - r1.film).max() < 1e-5
