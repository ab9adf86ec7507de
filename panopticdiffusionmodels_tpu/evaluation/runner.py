"""Evaluation / sampling drivers behind `eval.py` and `sample.py`.

Covers the reference's standalone eval scripts (`eval.py`, `eval_ldm*.py`,
`eval_t2i_discrete.py`, `sample_t2i_discrete.py`): load a checkpoint (orbax or
reference-format .pth via the torch bridge), generate `config.sample.n_samples`
with the configured solver, write PNGs with the FID/CLIP naming contract and
compute FID when reference stats + Inception weights are present.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from absl import logging

from ..diffusion.math import mos
from ..diffusion.analog_bits import ints_to_analog
from ..train import checkpoint as ckpt_lib
from ..train.trainer import Trainer
from .fid import fid_given_paths
from .sampler_io import sample2dir

INCEPTION_WEIGHTS = "assets/fid_stats/pt_inception-2015-12-05.pth"


def _load_weights(trainer: Trainer, config):
    nnet_path = config.get("nnet_path", "")
    if nnet_path and os.path.exists(nnet_path):
        if nnet_path.endswith(".pth"):
            from ..utils.torch_bridge import (
                convert_uvit,
                convert_uvit_t2i,
                load_torch_state_dict,
            )

            sd = load_torch_state_dict(nnet_path)
            if config.nnet.name == "uvit_t2i":
                # layout flags MUST match the target model: without
                # scan_blocks the converter emits unrolled names and
                # _merge_params silently matches nothing on scanned configs
                loaded = convert_uvit_t2i(
                    sd, depth=config.nnet.depth,
                    mlp_time_embed=config.nnet.mlp_time_embed,
                    scan_blocks=config.nnet.get("scan_blocks", False),
                    enable_panoptic=config.nnet.get("enable_panoptic", True),
                    separate=config.nnet.get("separate", True),
                )
            else:
                loaded = convert_uvit(
                    sd, depth=config.nnet.depth,
                    mlp_time_embed=config.nnet.mlp_time_embed,
                    num_classes=config.nnet.get("num_classes", -1),
                    scan_blocks=config.nnet.get("scan_blocks", False),
                )
            from ..train.trainer import _merge_params_counted

            merged, n_ok, n_all = _merge_params_counted(
                trainer.state.ema_params, loaded
            )
            if n_ok == 0:
                raise ValueError(
                    f"{nnet_path!r} matched ZERO parameters — layout mismatch "
                    "(check scan_blocks/enable_panoptic/separate in the config)"
                )
            trainer.state = trainer.state.replace(ema_params=merged)
            logging.info(
                f"loaded reference weights {nnet_path}: {n_ok}/{n_all} matched"
            )
            return
        state, ok = ckpt_lib.resume(os.path.dirname(nnet_path), trainer.state)
        if ok:
            trainer.state = state
            return
    trainer.resume()


def _context_stream(trainer: Trainer, batch_size: int):
    """Cycle deterministic test contexts (+ panoptic + index) for sampling.

    Batches are assembled CYCLICALLY over the split (with wrap-around) so
    every sample appears exactly once per cycle even when batch_size does
    not divide the split length — the reference's `idx + 10000*(idx//4992)`
    filename/caption-pairing contract assumes full, un-dropped coverage;
    a drop_last batch loader would silently skip the tail every epoch."""
    from concurrent.futures import ThreadPoolExecutor

    from ..data.loader import _collate

    test = trainer.dataset.get_split("test", labeled=True)
    n = len(test)
    ex = ThreadPoolExecutor(max_workers=4)
    pos = 0
    try:
        while True:
            idxs = [(pos + j) % n for j in range(batch_size)]
            pos = (pos + batch_size) % n
            yield _collate(list(ex.map(test.__getitem__, idxs)))
    finally:
        # Runs on generator .close() / GC — without it every FID-gate round
        # leaked 4 idle worker threads for the process lifetime.
        ex.shutdown(wait=False)


def _n_real_classes(config) -> int:
    """Real (non-null) class count for conditional sampling.  With CFG,
    `nnet.num_classes` includes the null class used as the unconditional label
    (reference `eval.py:43-46`: labels drawn in [0, K), null = K); without CFG
    every class id is real (e.g. imagenet64, num_classes=1000)."""
    k = config.nnet.get("num_classes", -1)
    assert k > 0, "conditional sampling needs config.nnet.num_classes"
    return k - 1 if config.sample.get("cfg", False) else k


class _LiveWeights:
    """Unpacks (`*weights`) to the trainer's CURRENT sample weights at each
    use, so cached jitted sample fns never sample with stale parameters."""

    def __init__(self, trainer: Trainer):
        self._trainer = trainer

    def __iter__(self):
        return iter(self._trainer.sample_weights())


def make_eval_sample_fn(trainer: Trainer, sample_steps: int, batch_size: int,
                        jit_cache: Optional[dict] = None):
    """Returns sample_fn(batch_size) with the sample2dir contract.

    `jit_cache`: optional dict for reusing the jitted sampler across repeated
    calls (the in-training FID gate runs every save_interval; re-tracing the
    whole sampling program each round is minutes through a remote-compile
    tunnel).  Weights are fetched from the trainer PER BATCH, so a cached
    program always samples with the current (EMA) parameters."""
    config = trainer.config
    task = trainer.task
    if jit_cache is None:
        jit_cache = {}
    cache_key = ("sample_fn", sample_steps)
    if cache_key not in jit_cache:
        jit_cache[cache_key] = jax.jit(
            trainer.build_sample_fn(sample_steps), static_argnames="n"
        )
    jit_sample = jit_cache[cache_key]
    weights = _LiveWeights(trainer)
    key_holder = {"key": jax.random.PRNGKey(config.seed + 777)}

    def next_key():
        key_holder["key"], k = jax.random.split(key_holder["key"])
        return k

    if task == "t2i_discrete":
        # Close the previous round's stream (releases its executor threads
        # deterministically) before starting a fresh cycle at position 0.
        prev = jit_cache.pop("ctx_stream", None)
        if prev is not None:
            prev.close()
        ctx_stream = _context_stream(trainer, batch_size)
        jit_cache["ctx_stream"] = ctx_stream
        panoptic_on = bool(config.nnet.enable_panoptic)
        counter = {"n": 0}

        def sample_fn(n):
            batch = next(ctx_stream)
            # modulo matches sample2dir's 4992-bucket naming (see next_indices)
            fallback_index = np.arange(counter["n"], counter["n"] + n) % 4992
            counter["n"] += n
            if len(batch) >= 4:
                moments, context, panoptic, index = batch[:4]
            elif len(batch) == 3:
                moments, context, third = batch
                if np.ndim(third) <= 1:
                    # (moments, context, index): non-panoptic features with
                    # return_index — a (B,) int field is never a seg map
                    panoptic, index = None, third
                else:
                    panoptic, index = third, fallback_index
            else:
                moments, context = batch[:2]
                panoptic, index = None, fallback_index
            if config.nnet.get("use_ground_truth", False) and panoptic is not None:
                # GT-conditioned evaluation (reference eval with use_ground_truth)
                samples_out = jit_sample(
                    *weights, next_key(), jax.numpy.asarray(context),
                    jax.numpy.asarray(panoptic),
                )
            else:
                samples_out = jit_sample(*weights, next_key(), jax.numpy.asarray(context))
            if panoptic_on:
                samples, pred_mask = samples_out
                if panoptic is not None:
                    target = ints_to_analog(
                        jax.numpy.asarray(panoptic), n=config.nnet.mask_bits
                    )
                    # Stays a DEVICE array: converting here would force a sync
                    # and defeat sample2dir's dispatch/write overlap.
                    loss_mask = mos(target - pred_mask)
                else:
                    loss_mask = np.nan
                return np.asarray(index), samples, pred_mask, loss_mask, panoptic
            return np.asarray(index), samples_out

        return sample_fn, panoptic_on

    # Running sample counter: sample2dir names files from the returned
    # indices, so per-batch np.arange(n) would collide across batches and
    # overwrite everything within a 4992-name bucket.  The modulo keeps the
    # reference's `i + 10000*(written//4992)` naming contract (index cycles
    # in lockstep with the bucket), giving globally unique names.
    counter = {"n": 0}

    def next_indices(n):
        idx = np.arange(counter["n"], counter["n"] + n) % 4992
        counter["n"] += n
        return idx

    if task == "latent_discrete" or (
        task in ("pixel_sde", "latent_sde") and config.train.get("mode") == "cond"
    ):
        n_classes = _n_real_classes(config)

        def sample_fn(n):
            y = jax.random.randint(next_key(), (n,), 0, n_classes)
            samples = jit_sample(*weights, next_key(), y)
            return next_indices(n), samples

        return sample_fn, False

    def sample_fn(n):
        samples = jit_sample(*weights, next_key(), None, n=n)
        return next_indices(n), samples

    return sample_fn, False


def _log_captions(trainer: Trainer, workdir: str, indices):
    """Record the prompts of the first sampled batch (the reference's
    eval_caption.log, `train_t2i_discrete.py:645-653`); caption text files are
    the `{i}_text.txt` outputs of the extraction scripts."""
    base = getattr(trainer.dataset, "path", None)
    if not base:
        return
    val_dir = os.path.join(base, "val")
    lines = []
    for i in indices:
        p = os.path.join(val_dir, f"{int(i)}_text.txt")
        if os.path.exists(p):
            with open(p) as f:
                lines.append(f"{int(i)}: {f.readline().strip()}")
    if lines and jax.process_index() == 0:
        with open(os.path.join(workdir, "eval_caption.log"), "a") as f:
            f.write("\n".join(lines) + "\n")


def evaluate(config, workdir: str, n_samples: Optional[int] = None):
    trainer = Trainer(config, workdir)
    _load_weights(trainer, config)
    sample_dir = os.path.join(workdir, "samples")
    mask_dir = os.path.join(workdir, "mask")
    n = n_samples or config.sample.n_samples
    bs = config.sample.mini_batch_size
    sample_fn, use_panoptic = make_eval_sample_fn(trainer, config.sample.sample_steps, bs)
    if trainer.task == "t2i_discrete":
        first = {"done": False}
        inner = sample_fn

        def sample_fn(nb):  # noqa: F811 — wrap to log first-batch captions
            out = inner(nb)
            if not first["done"]:
                first["done"] = True
                _log_captions(trainer, workdir, np.asarray(out[0]))
            return out

    metrics = sample2dir(
        sample_dir, n, bs, sample_fn,
        unpreprocess_fn=trainer.dataset.unpreprocess,
        use_panoptic=use_panoptic,
        mask_path=mask_dir,
        mask_bits=config.nnet.get("mask_bits", 8),
    )
    fid = _score_fid(trainer, sample_dir, workdir, n, metrics)
    if fid is not None:
        logging.info(f"FID{n}: {fid}")
    logging.info(f"eval metrics: {metrics}")
    return metrics


def _score_fid(trainer: Trainer, sample_dir: str, workdir: str, n: int,
               metrics: dict, step: Optional[int] = None):
    """FID vs the dataset's reference stats when the assets exist; writes
    eval.log and adds metrics['fid'].  Shared by evaluate() and the
    training-time FID gate."""
    fid_stat = trainer.dataset.fid_stat
    if not (
        jax.process_index() == 0
        and fid_stat
        and os.path.exists(fid_stat)
        and os.path.exists(INCEPTION_WEIGHTS)
    ):
        return None
    from .inception import load_torch_inception_weights, make_extractor

    extractor = make_extractor(load_torch_inception_weights(INCEPTION_WEIGHTS))
    fid = fid_given_paths(fid_stat, sample_dir, extractor)
    metrics["fid"] = fid
    with open(os.path.join(workdir, "eval.log"), "a") as f:
        tag = f"step={step} " if step is not None else ""
        print(f"{tag}fid{n}={fid} {metrics}", file=f)
    return fid


def sample_only(config, workdir: str):
    return evaluate(config, workdir, n_samples=config.sample.mini_batch_size)


def make_vis_callback(n_images: int = 16, sample_steps: int = 50):
    """Periodic sample-grid writer (the reference's wandb image grids,
    `train.py:166-178`, `train_t2i_discrete.py:637-689`): writes
    workdir/train_samples/{step}.png (+ {step}_mask.png for panoptic)."""
    cache = {}

    def callback(trainer: Trainer, step: int):
        if jax.process_index() != 0:
            return
        from ..diffusion.analog_bits import bits2int
        from .mask_metrics import color_map
        from .sampler_io import save_grid

        import jax.numpy as jnp

        n = min(n_images, trainer.config.sample.mini_batch_size)
        if "fn" not in cache:
            cache["fn"] = jax.jit(
                trainer.build_sample_fn(sample_steps), static_argnames="n"
            )
        weights = trainer.sample_weights()
        key = jax.random.fold_in(jax.random.PRNGKey(trainer.config.seed + 99), step)
        task = trainer.task
        out_dir = os.path.join(trainer.workdir, "train_samples")
        os.makedirs(out_dir, exist_ok=True)
        if task == "t2i_discrete":
            test = trainer.dataset.get_split("test", labeled=True)
            ctx = np.stack([np.asarray(test[i][1]) for i in range(n)])
            out = cache["fn"](*weights, key, jnp.asarray(ctx))
        elif task == "latent_discrete" or trainer.config.train.get("mode") == "cond":
            # separate keys: labels and init noise must be independent draws
            k_y, key = jax.random.split(key)
            y = jax.random.randint(k_y, (n,), 0, _n_real_classes(trainer.config))
            out = cache["fn"](*weights, key, y)
        else:
            out = cache["fn"](*weights, key, None, n=n)
        if isinstance(out, tuple):
            samples, pred_mask = out
            ids = np.asarray(
                bits2int(np.asarray(pred_mask) > 0,
                         n=trainer.config.nnet.get("mask_bits", 8))
            )
            colors = color_map(ids).astype(np.float32) / 255.0
            save_grid(colors, os.path.join(out_dir, f"{step}_mask.png"))
        else:
            samples = out
        samples01 = trainer.dataset.unpreprocess(np.asarray(samples, dtype=np.float32))
        save_grid(samples01, os.path.join(out_dir, f"{step}.png"))
        logging.info(f"wrote sample grid at step {step}")

    return callback


def make_fid_gated_callback(n_samples: Optional[int] = None):
    """In-training eval callback with best-FID checkpoint retention
    (reference `train.py:182-196`, `train_t2i_discrete.py:694-710`): every
    save_interval, sample + score; keep the checkpoint only when FID (or, with
    no FID assets, eval_loss_mask / nothing) improves."""
    best = {"fid": None}
    jit_cache: dict = {}  # one traced sampler reused across eval rounds

    def callback(trainer: Trainer, step: int):
        from ..train import checkpoint as ckpt_lib

        config = trainer.config
        fid_stat = trainer.dataset.fid_stat
        fid_ready = (
            fid_stat and os.path.exists(fid_stat) and os.path.exists(INCEPTION_WEIGHTS)
        )
        if not fid_ready:
            # No scoring assets: keep every save-interval checkpoint instead of
            # sampling n_samples for nothing.
            if jax.process_index() == 0:
                logging.info("FID assets missing; saving ungated checkpoint")
                ckpt_lib.save_checkpoint(trainer.ckpt_root, trainer.state)
            return {}
        n = n_samples or config.sample.n_samples
        bs = config.sample.mini_batch_size
        sample_dir = os.path.join(trainer.workdir, "samples")
        mask_dir = os.path.join(trainer.workdir, "mask")
        sample_fn, use_panoptic = make_eval_sample_fn(
            trainer, config.sample.sample_steps, bs, jit_cache=jit_cache
        )
        metrics = sample2dir(
            sample_dir, n, bs, sample_fn,
            unpreprocess_fn=trainer.dataset.unpreprocess,
            use_panoptic=use_panoptic,
            mask_path=mask_dir,
            mask_bits=config.nnet.get("mask_bits", 8),
        )
        fid = _score_fid(trainer, sample_dir, trainer.workdir, n, metrics,
                         step=step)
        logging.info(f"eval@{step}: {metrics}")
        if jax.process_index() == 0:
            improved = fid is None or best["fid"] is None or fid <= best["fid"]
            if improved:
                if fid is not None:
                    best["fid"] = fid
                logging.info(f"saving best checkpoint at step {step}")
                ckpt_lib.save_checkpoint(trainer.ckpt_root, trainer.state)
        return metrics

    return callback
