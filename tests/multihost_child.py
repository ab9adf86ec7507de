"""Child process for the 2-process multi-host regression test.

Launched (twice) by tests/test_multiprocess.py: each process brings up a
4-device CPU backend, joins a 2-process `jax.distributed` job (8 global
devices, Gloo collectives), builds the synthetic-tiny Trainer on a
(dp=2, fsdp=2, tp=2) mesh, feeds it through the REAL multi-process data path
(process-consistent global shuffle -> local row slice ->
`jax.make_array_from_process_local_data`), runs a few jitted train steps, and
writes the per-step losses to a JSON file for the parent to compare against a
single-process run.  This validates the multi-host story the reference gets
from `accelerate launch --num_processes N` (`run_commands.sh:14-38`).

Not collected by pytest (no test_ prefix).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Platform config MUST precede any backend initialization; the deployment
# image pre-registers an accelerator plugin that ignores JAX_PLATFORMS env.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)


def run_eval(config, workdir, out_path, process_id):
    import numpy as np

    from panopticdiffusionmodels_tpu.evaluation.fid import dir_statistics
    from panopticdiffusionmodels_tpu.evaluation.inception import (
        make_extractor,
        random_params,
    )
    from panopticdiffusionmodels_tpu.evaluation.runner import (
        make_eval_sample_fn,
    )
    from panopticdiffusionmodels_tpu.evaluation.sampler_io import sample2dir
    from panopticdiffusionmodels_tpu.train.trainer import Trainer

    trainer = Trainer(config, workdir)
    sample_dir = os.path.join(os.path.dirname(out_path), "samples")
    mask_dir = os.path.join(os.path.dirname(out_path), "mask")
    sample_fn, use_panoptic = make_eval_sample_fn(
        trainer, sample_steps=5, batch_size=8
    )
    metrics = sample2dir(
        sample_dir, 16, 8, sample_fn,
        unpreprocess_fn=trainer.dataset.unpreprocess,
        use_panoptic=use_panoptic, mask_path=mask_dir,
        mask_bits=config.nnet.get("mask_bits", 8),
    )
    if process_id == 0:
        mu, sigma = dir_statistics(
            sample_dir, make_extractor(random_params(0)), batch_size=8
        )
        np.savez(out_path, mu=mu, sigma=sigma,
                 names=sorted(os.listdir(sample_dir)),
                 mask_names=sorted(os.listdir(mask_dir)),
                 eval_loss_mask=metrics.get("eval_loss_mask", np.nan))
    print(f"eval child {process_id} done: {metrics}", flush=True)


def main():
    process_id = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]
    workdir = sys.argv[4]
    mesh_kind = sys.argv[5] if len(sys.argv) > 5 else "default"
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=2, process_id=process_id
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    from panopticdiffusionmodels_tpu.configs import get_config
    from panopticdiffusionmodels_tpu.train.trainer import Trainer

    config = get_config("synthetic_tiny")
    if mesh_kind == "eval":
        # Multi-host EVALUATION: sample2dir -> dir_statistics with the
        # sampler's global arrays gathered across processes before rank-0
        # writes (the reference capability: accelerator.gather at
        # utils.py:585-588 feeding rank-0 PNG writes + FID).  The parent
        # compares the file set and (mu, sigma) against a single-process run.
        config.mesh.dp, config.mesh.fsdp, config.mesh.tp = 2, 2, 2
        run_eval(config, workdir, out_path, process_id)
        return
    if mesh_kind == "pp":
        # One pipeline stage per process ('pp' is the outermost mesh axis, so
        # the host boundary falls between stages): the tick ppermutes cross
        # the process boundary, and the batch is REPLICATED across hosts —
        # each process must feed the FULL batch (process_batch_slice).
        config.mesh.dp, config.mesh.fsdp, config.mesh.pp = 2, 2, 2
        config.nnet.scan_blocks = True
    elif mesh_kind == "sp":
        # Sequence parallelism with the dp axis split across hosts: the
        # 'sp' ring (ops/ring_attention.py, tp=1 so ring is engaged) rotates
        # K/V intra-host while each host feeds its disjoint batch rows.
        config.mesh.dp, config.mesh.fsdp, config.mesh.sp = 2, 2, 2
    else:
        config.mesh.dp, config.mesh.fsdp, config.mesh.tp = 2, 2, 2
    config.train.batch_size = 16
    config.num_workers = 2
    trainer = Trainer(config, workdir)
    stream = trainer.data_stream()
    losses = []
    for i in range(3):
        batch = next(stream)
        key = jax.random.fold_in(jax.random.PRNGKey(7), i)
        trainer.state, metrics = trainer._train_step(trainer.state, batch, key)
        losses.append([float(metrics["loss"]), float(metrics["loss_mask"])])
    if process_id == 0:
        with open(out_path, "w") as f:
            json.dump(losses, f)
    print(f"child {process_id} done: {losses}", flush=True)


if __name__ == "__main__":
    main()
