#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint into this framework's orbax format.

Usage:
  python scripts/convert_checkpoint.py --config mscoco_uvit_small \
      --nnet path/to/nnet_ema.pth --out results/converted/ckpts

Writes a `{0}.ckpt` orbax directory whose ema_params carry the converted
weights; `train.py --workdir results/converted` resumes from it, and `eval.py`
can read the `.pth` directly via `--config.nnet_path` without this step.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--nnet", required=True, help="reference .pth state dict")
    p.add_argument("--out", required=True, help="checkpoint root directory")
    args = p.parse_args()

    import jax

    from panopticdiffusionmodels_tpu.cli import load_config
    from panopticdiffusionmodels_tpu.serving import GenerationPipeline
    from panopticdiffusionmodels_tpu.train import (
        create_train_state,
        make_optimizer,
        save_checkpoint,
    )
    from panopticdiffusionmodels_tpu.train.state import make_lr_schedule

    config = load_config(args.config)
    pipe = GenerationPipeline.from_config(config, nnet_path=args.nnet)
    # The optimizer must be constructed EXACTLY like the Trainer's: a
    # schedule callable adds a ScaleByScheduleState leaf to opt_state, a
    # config.pretrained freeze adds a multi_transform partition, and a
    # structurally different tree makes orbax refuse the resume
    # (tests/test_weights_runbook.py drills this path).
    lr_sched = make_lr_schedule(
        config.optimizer.lr,
        config.lr_scheduler.name,
        warmup_steps=config.lr_scheduler.get("warmup_steps", -1),
        total_steps=config.train.n_steps,
    )
    frozen_mask = None
    if config.get("pretrained", ""):
        # Mirror Trainer._init_state: pretrained panoptic configs freeze the
        # image stream, which partitions opt_state via optax.multi_transform.
        from panopticdiffusionmodels_tpu.train.state import (
            panoptic_image_stream_mask,
        )

        frozen_mask = {
            "params": panoptic_image_stream_mask(pipe.params["params"])
        }
    tx = make_optimizer(config.optimizer.name,
                        lr_schedule=lr_sched,
                        weight_decay=config.optimizer.get("weight_decay", 0.0),
                        betas=tuple(config.optimizer.betas),
                        frozen_mask=frozen_mask)
    state = create_train_state(pipe.params, tx)
    save_checkpoint(args.out, state)
    n = sum(a.size for a in jax.tree.leaves(pipe.params))
    print(f"wrote {args.out}/0.ckpt ({n} params)")


if __name__ == "__main__":
    main()
