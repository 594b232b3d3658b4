"""TRUE multi-process distributed validation (2 local processes).

Everything else in the suite runs single-process (with a fake 8-device
mesh); these tests spawn two real processes with
``jax.distributed.initialize`` over a localhost coordinator and drive the
ACTUAL multi-host code paths: ``host_batch_slice`` feeding per-host shards,
``global_batch`` assembly, and the seg trainer's ``process_count > 1``
branch — with real cross-process collectives on the CPU backend.

This is the same wiring a TPU pod slice uses (per-host input feed + GSPMD
collectives), exercised without TPU hardware.
"""

import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

_WORKER = textwrap.dedent("""
    import json, os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]; repo = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    import numpy as np
    import jax.numpy as jnp
    sys.path.insert(0, repo)
    from jax.sharding import Mesh
    from ugpg_tpu.data.synthetic import disk_dataset
    from ugpg_tpu.parallel.distributed import host_batch_slice, is_multi_host
    from ugpg_tpu.train.seg_trainer import UncertaintyGuidedProgressiveTrainer

    assert is_multi_host() and jax.process_count() == 2
    assert len(jax.devices()) == 4  # 2 procs x 2 local cpu devices

    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 1), ("data", "model"))
    cfgs = {1: {"resolution": 32, "epochs_per_stage": 1, "lr": 3e-4}}
    tr = UncertaintyGuidedProgressiveTrainer(
        stage_configs=cfgs, seed=0, verbose=False, mesh=mesh
    )
    tr.setup_optimizer(1)

    # identical global batch on every host; each feeds only its local slice
    imgs, masks = disk_dataset(num_samples=8, image_size=32, seed=3)
    sl = host_batch_slice(8)
    loader = [(imgs[sl], masks[sl])]
    out = tr.train_epoch(loader, 1)
    print("METRICS " + json.dumps([float(v) for v in out]), flush=True)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(worker, port):
    """Spawn both workers; always reap them (kill on timeout/failure)."""
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port), str(REPO)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in (0, 1)
    ]
    outs = ["", ""]
    try:
        deadline = 420.0
        import time as _time

        t0 = _time.monotonic()
        for i, p in enumerate(procs):
            remaining = max(5.0, deadline - (_time.monotonic() - t0))
            outs[i], _ = p.communicate(timeout=remaining)
        return [p.returncode for p in procs], outs
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()


@pytest.mark.slow
def test_two_process_distributed_training(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    # the free-port probe has an unavoidable bind-reuse race on busy hosts;
    # one retry with a fresh port absorbs it (and any startup flake)
    for attempt in (0, 1):
        try:
            codes, outs = _run_workers(worker, _free_port())
        except subprocess.TimeoutExpired:
            if attempt == 0:
                continue
            raise
        if all(c == 0 for c in codes):
            break
        assert attempt == 0, (
            f"workers failed twice:\n{outs[0][-2000:]}\n{outs[1][-2000:]}"
        )

    import json

    metrics = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("METRICS ")][-1]
        metrics.append(json.loads(line[len("METRICS "):]))
    # both processes observe the SAME global metrics (one SPMD program)
    for a, b in zip(*metrics):
        assert abs(a - b) < 1e-6, metrics
    assert np.isfinite(metrics[0][0])
