"""The unified training/evaluation engine.

One engine replaces the reference's four copy-pasted per-script loops
(`train.py`, `train_ldm.py`, `train_ldm_discrete.py`, `train_t2i_discrete.py`);
the config selects the task:

  * 'pixel_sde'      — images, continuous VP-SDE loss, EM/continuous-DPM sampling
                       (reference `train.py`),
  * 'latent_sde'     — pre-encoded moments -> VAE reparam draw, continuous loss
                       (reference `train_ldm.py`),
  * 'latent_discrete'— moments + labels, discrete SD schedule, class-cond CFG
                       (reference `train_ldm_discrete.py`),
  * 't2i_discrete'   — moments + CLIP context [+ panoptic mask], joint loss and
                       mask-aware solver (reference `train_t2i_discrete.py`).

TPU architecture (vs. the reference's DDP loops):
  * ONE jitted `train_step(state, batch, key) -> (state, metrics)` with state
    donation; gradient reduction across the mesh comes out of XLA's partitioner,
  * the eval sampler (CFG forward fused 2x-batch, all solver steps, the VAE
    decode) compiles into a single XLA program — no per-NFE host sync,
  * EMA params are the sampling weights, updated inside the train step,
  * per-host data loading: each process feeds its addressable shards.
"""
from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from absl import logging

from ..data import Loader, get_dataset, prefetch_to_device
from ..diffusion import (
    Schedule,
    VPSDE,
    ScoreModel,
    ReverseSDE,
    ODE,
    l_simple_continuous,
    l_simple,
    l_simple_panoptic,
    stable_diffusion_beta_schedule,
)
from ..diffusion.cfg import make_cfg_class_cond, make_cfg_t2i
from ..models import get_nnet
from ..models.vae import get_model as get_vae, sample_from_moments
from ..parallel import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_opt_state_rules,
    shard_params_rules,
    token_sharding,
)
from ..parallel.pipeline import make_pipelined_apply
from ..samplers import DPMSolver, NoiseScheduleVP, euler_maruyama
from ..utils import cnt_params, dct2str
from . import checkpoint as ckpt_lib
from .state import (
    TrainState,
    create_train_state,
    make_lr_schedule,
    make_optimizer,
    panoptic_image_stream_mask,
)

TASKS = ("pixel_sde", "latent_sde", "latent_discrete", "t2i_discrete")


def infer_task(config) -> str:
    """Fallback for configs that don't set `config.task` (every zoo config
    does).  The latent family is REFUSED here rather than guessed: `pred` is
    set in every base config and both latent variants sample with dpm_solver
    in the reference (`train_ldm.py` vs `train_ldm_discrete.py`), so any
    heuristic silently trains the wrong loss for one of them."""
    if config.nnet.name in ("uvit_t2i", "unet_t2i"):
        return "t2i_discrete"
    if "autoencoder" in config and "z_shape" in config:
        raise ValueError(
            "ambiguous latent config: set config.task to 'latent_discrete' "
            "or 'latent_sde' explicitly"
        )
    return "pixel_sde"


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


class Trainer:
    def __init__(self, config, workdir: Optional[str] = None):
        self.config = config
        self.task = config.get("task", None) or infer_task(config)
        assert self.task in TASKS, f"unknown task {self.task!r}, expected one of {TASKS}"
        self.workdir = workdir or config.get("workdir", "") or "results/run"
        self.ckpt_root = os.path.join(self.workdir, "ckpts")
        self.sample_dir = os.path.join(self.workdir, "samples")
        if jax.process_index() == 0:
            os.makedirs(self.ckpt_root, exist_ok=True)
            os.makedirs(self.sample_dir, exist_ok=True)

        mesh_cfg = config.get("mesh", None)
        dp = None if (mesh_cfg is None or mesh_cfg.dp == -1) else mesh_cfg.dp
        self.mesh = make_mesh(
            dp=dp,
            fsdp=1 if mesh_cfg is None else mesh_cfg.fsdp,
            tp=1 if mesh_cfg is None else mesh_cfg.tp,
            sp=1 if mesh_cfg is None else mesh_cfg.get("sp", 1),
            pp=1 if mesh_cfg is None else mesh_cfg.get("pp", 1),
        )
        self.batch_sharding = batch_sharding(self.mesh)
        self.repl_sharding = replicated_sharding(self.mesh)
        self.token_sharding = token_sharding(self.mesh)  # None unless sp > 1

        # --- dataset -------------------------------------------------------
        ds_kwargs = dict(config.dataset)
        self.dataset = get_dataset(ds_kwargs.pop("name"), **ds_kwargs)

        # --- model ---------------------------------------------------------
        nnet_kwargs = dict(config.nnet)
        nnet_kwargs.pop("name")
        # use_ground_truth is a call-time mode consumed by the loss, not a
        # constructor field (reference passes it per-forward,
        # `train_t2i_discrete.py:166-171`).
        nnet_kwargs.pop("use_ground_truth", None)
        nnet_kwargs["dtype"] = _dtype(config.get("compute_dtype", "bfloat16"))
        if self.token_sharding is not None:
            # Sequence parallelism: the model re-asserts the token sharding at
            # every block boundary.  Only the U-ViT families thread the
            # constraint; the UNet family's conv/attention mix has no single
            # token axis to shard.
            if config.nnet.name not in ("uvit", "uvit_t2i"):
                raise ValueError(
                    f"mesh.sp>1 is not supported for nnet {config.nnet.name!r}"
                )
            nnet_kwargs["token_sharding"] = self.token_sharding
            # The packed-qkv Pallas kernel is one opaque custom call — the
            # SPMD partitioner cannot split it along L, so it would force a
            # full all-gather of the sequence at every attention.  The
            # sequence-partitionable native path is ring attention
            # (ops/ring_attention.py): K/V shards rotate over the 'sp' ring
            # via ppermute, streaming softmax keeps it exact, and no (L, C)
            # gather ever materializes.  attn_impl='xla' remains the opt-out
            # (partitionable einsums, partitioner-chosen gathers).
            if nnet_kwargs.get("attn_impl", "auto") not in ("xla", "ring"):
                logging.info(
                    "mesh.sp>1: routing attention to the 'sp'-ring kernel "
                    "(the Pallas custom call is not sequence-partitionable)"
                )
                nnet_kwargs["attn_impl"] = "ring"
        self.nnet = get_nnet(config.nnet.name, **nnet_kwargs)

        # Pipeline parallelism: replace the model forward's block trunk with
        # the 'pp'-staged boomerang pipeline (parallel/pipeline.py) — the
        # training loss here, and build_sample_fn builds its own pipelined
        # apply for the inference clone.
        self._pipe_apply = None
        pp = self.mesh.shape["pp"]
        if pp > 1:
            if config.nnet.name not in ("uvit", "uvit_t2i"):
                raise ValueError(
                    f"mesh.pp>1 is not supported for nnet {config.nnet.name!r}"
                )
            if not nnet_kwargs.get("scan_blocks", False):
                raise ValueError("mesh.pp>1 requires nnet.scan_blocks=True")
            if self.mesh.shape["sp"] > 1 or self.mesh.shape["tp"] > 1:
                raise ValueError(
                    "mesh.pp>1 requires sp == tp == 1 (the pipelined trunk "
                    "runs under manual SPMD; sp/tp rely on the automatic "
                    "partitioner)"
                )
            if (config.nnet.depth // 2) % pp != 0:
                raise ValueError(
                    f"mesh.pp={pp} must divide depth/2={config.nnet.depth // 2}"
                )
            num_micro = int(config.train.get("pp_microbatches", 0)) or pp
            data_shards = self.mesh.shape["dp"] * self.mesh.shape["fsdp"]
            if config.train.batch_size % (num_micro * data_shards) != 0:
                raise ValueError(
                    f"batch_size {config.train.batch_size} must divide into "
                    f"{num_micro} microbatches x {data_shards} data shards"
                )
            self._pipe_apply = make_pipelined_apply(
                self.nnet, self.mesh, num_micro=num_micro
            )
            self._pp_num_micro = num_micro
        # PROCESS-CONSISTENT: this key seeds param init and the per-step loss
        # keys, both of which are replicated inputs to SPMD programs — folding
        # in process_index here would hand every host different "replicated"
        # values (divergent params, divergent noise) under multi-process runs.
        # Data-feed decorrelation comes from disjoint per-process index sets
        # (see data_stream), never from the model rng.
        self.rng = jax.random.PRNGKey(config.seed)

        params = self._init_params()
        logging.info(f"nnet has {cnt_params(params)} parameters")

        # --- optimizer / state ---------------------------------------------
        lr_sched = make_lr_schedule(
            config.optimizer.lr,
            config.lr_scheduler.name,
            warmup_steps=config.lr_scheduler.get("warmup_steps", -1),
            total_steps=config.train.n_steps,
        )
        frozen_mask = None
        if config.get("pretrained", ""):
            pretrained = config.pretrained
            if not os.path.exists(pretrained):
                # Fail loudly: proceeding would FREEZE a randomly-initialized
                # image stream and train garbage with no error.
                raise FileNotFoundError(
                    f"config.pretrained={pretrained!r} does not exist"
                )
            from ..utils.torch_bridge import load_torch_state_dict

            sd = load_torch_state_dict(pretrained)
            if config.nnet.name == "unet_t2i":
                # miniSD / LDM checkpoint (reference use_unet path,
                # train_t2i_discrete.py:279-287)
                from ..utils.ldm_bridge import convert_ldm_unet

                loaded = convert_ldm_unet(
                    sd,
                    channel_mult=tuple(config.nnet.channel_mult),
                    num_res_blocks=config.nnet.num_res_blocks,
                )
            else:
                from ..utils.torch_bridge import convert_uvit_t2i

                # enable_panoptic/separate declare the TARGET layout so an
                # image-only checkpoint lands in the dual-scan module names.
                loaded = convert_uvit_t2i(
                    sd, depth=config.nnet.depth,
                    mlp_time_embed=config.nnet.mlp_time_embed,
                    scan_blocks=config.nnet.get("scan_blocks", False),
                    enable_panoptic=config.nnet.get("enable_panoptic", True),
                    separate=config.nnet.get("separate", True),
                )
            params, n_merged, n_loaded = _merge_params_counted(params, loaded)
            logging.info(
                f"loaded pretrained image stream from {pretrained}: "
                f"{n_merged}/{n_loaded} converted leaves matched"
            )
            if n_merged == 0:
                raise ValueError(
                    f"pretrained checkpoint {pretrained!r} matched ZERO "
                    "parameters — layout mismatch (check scan_blocks/"
                    "enable_panoptic/separate)"
                )
            # Freeze exactly the reference's image-stream set; the mask
            # stream (incl. mid_block_mask / zero convs) must train.
            frozen_mask = {"params": panoptic_image_stream_mask(params["params"])}
        tx = make_optimizer(
            config.optimizer.name,
            lr_schedule=lr_sched,
            weight_decay=config.optimizer.get("weight_decay", 0.0),
            betas=tuple(config.optimizer.betas),
            frozen_mask=frozen_mask,
        )
        state = create_train_state(params, tx)
        # Place on mesh.  The Adam moments follow the SAME rules as their
        # params (ZeRO-3: moments are 2x param bytes — replicating them would
        # forfeit most of the fsdp memory win); scalar counts replicate.
        rules = shard_params_rules(state.params, self.mesh)
        state = state.replace(
            params=jax.device_put(state.params, rules),
            ema_params=jax.device_put(state.ema_params, rules),
            opt_state=jax.device_put(
                state.opt_state, shard_opt_state_rules(state.opt_state, self.mesh)
            ),
            step=jax.device_put(state.step, self.repl_sharding),
        )
        self.state = state

        # --- diffusion core ------------------------------------------------
        if self.task in ("pixel_sde", "latent_sde"):
            self.sde = VPSDE()
        else:
            self.betas = stable_diffusion_beta_schedule()
            self.schedule = Schedule(self.betas)
            self.noise_schedule = NoiseScheduleVP("discrete", betas=self.betas)

        # --- frozen VAE ----------------------------------------------------
        self.vae = None
        self.vae_params = None
        if "autoencoder" in config:
            self.vae = get_vae(scale_factor=config.autoencoder.get("scale_factor", 0.18215))
            ae_path = config.autoencoder.get("pretrained_path", "")
            if ae_path and os.path.exists(ae_path):
                from ..utils.torch_bridge import (
                    convert_autoencoder_kl,
                    load_torch_state_dict,
                )

                self.vae_params = jax.device_put(
                    convert_autoencoder_kl(load_torch_state_dict(ae_path)),
                    self.repl_sharding,
                )

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))

    # ----------------------------------------------------------------------

    def _init_params(self):
        key = jax.random.fold_in(self.rng, 0)
        shape = self.config.get("z_shape", None)
        if shape is None:
            shape = self.dataset.data_shape
        x = jnp.zeros((1, *shape))
        t = jnp.zeros((1,))
        if self.task == "t2i_discrete":
            ctx = jnp.zeros((1, self.config.nnet.num_clip_token, self.config.nnet.clip_dim))
            if self.config.nnet.enable_panoptic:
                m = jnp.zeros(
                    (1, self.config.nnet.mask_size, self.config.nnet.mask_size,
                     self.config.nnet.mask_bits)
                )
                return self.nnet.init(key, x, t, ctx, mask_token=m)
            return self.nnet.init(key, x, t, ctx)
        if self.config.nnet.get("num_classes", -1) > 0:
            return self.nnet.init(key, x, t, jnp.zeros((1,), jnp.int32))
        return self.nnet.init(key, x, t)

    # --- loss --------------------------------------------------------------

    def _apply(self, params, *args, **kwargs):
        """Training-path model forward: the pipelined trunk under mesh.pp>1,
        plain nnet.apply otherwise."""
        if self._pipe_apply is not None:
            return self._pipe_apply(params, *args, **kwargs)
        return self.nnet.apply(params, *args, **kwargs)

    def _loss(self, params, batch, key):
        cfgt = self.config.train
        metrics = {}
        if self.task == "pixel_sde":
            if cfgt.get("mode", "uncond") == "cond":
                x, y = batch
            else:
                x, y = (batch[0] if isinstance(batch, tuple) else batch), None
            sm = ScoreModel(
                lambda xx, tt, **kw: self._apply(params, xx, tt, **kw),
                self.config.pred,
                self.sde,
            )
            kwargs = {} if y is None else {"y": y}
            loss = l_simple_continuous(key, sm, x, pred=self.config.pred, **kwargs)
            metrics["loss"] = loss.mean()
            return loss.mean(), metrics
        if self.task == "latent_sde":
            moments, y = batch[0], (batch[1] if cfgt.get("mode", "cond") == "cond" else None)
            k1, k2 = jax.random.split(key)
            z = sample_from_moments(k1, moments, self.config.autoencoder.scale_factor)
            sm = ScoreModel(
                lambda xx, tt, **kw: self._apply(params, xx, tt, **kw),
                self.config.pred,
                self.sde,
            )
            kwargs = {} if y is None else {"y": y}
            loss = l_simple_continuous(k2, sm, z, pred=self.config.pred, **kwargs)
            metrics["loss"] = loss.mean()
            return loss.mean(), metrics
        if self.task == "latent_discrete":
            moments, y = batch
            k1, k2 = jax.random.split(key)
            z = sample_from_moments(k1, moments, self.config.autoencoder.scale_factor)
            loss = l_simple(
                k2, z,
                lambda xx, tt, **kw: self._apply(params, xx, tt, y),
                self.schedule,
            )
            metrics["loss"] = loss.mean()
            return loss.mean(), metrics
        # t2i_discrete
        k1, k2 = jax.random.split(key)
        moments, context = batch[0], batch[1]
        z = sample_from_moments(k1, moments, self.config.autoencoder.scale_factor)
        if self.config.nnet.enable_panoptic:
            panoptic = batch[2]

            def nnet_fn(xx, tt, mask_token=None, use_ground_truth=False):
                return self._apply(
                    params, xx, tt, context,
                    mask_token=mask_token, use_ground_truth=use_ground_truth,
                )

            loss_eps, loss_mask = l_simple_panoptic(
                k2, z, nnet_fn, self.schedule, panoptic,
                mask_bits=self.config.nnet.mask_bits,
                use_ground_truth=self.config.nnet.get("use_ground_truth", False),
                use_twophases=bool(self.config.get("use_twophases", False)),
            )
            metrics["loss"] = loss_eps.mean()
            metrics["loss_mask"] = loss_mask.mean()
            if self.config.nnet.get("use_ground_truth", False):
                return loss_eps.mean(), metrics
            return loss_eps.mean() + loss_mask.mean(), metrics
        loss = l_simple(
            k2, z,
            lambda xx, tt, **kw: self._apply(params, xx, tt, context),
            self.schedule,
        )
        metrics["loss"] = loss.mean()
        return loss.mean(), metrics

    def _train_step_impl(self, state: TrainState, batch, key):
        import optax

        accum = int(self.config.train.get("grad_accum", 1))
        grad_fn = jax.value_and_grad(self._loss, has_aux=True)
        if accum <= 1:
            (loss, metrics), grads = grad_fn(state.params, batch, key)
        else:
            # Gradient accumulation: split the batch into `accum` microbatches
            # and lax.scan the grad computation — activation memory scales with
            # the microbatch while the optimizer sees the full-batch gradient.
            # (Neither the reference nor its launches use accumulation,
            # SURVEY.md par.2.2; this is a capability extension for
            # memory-limited chips.)
            micro = jax.tree.map(
                lambda x: x.reshape(accum, x.shape[0] // accum, *x.shape[1:]), batch
            )
            keys = jax.random.split(key, accum)

            def body(carry, xs):
                mb, k = xs
                (_, m), g = grad_fn(state.params, mb, k)
                return jax.tree.map(jnp.add, carry, g), m

            zero = jax.tree.map(jnp.zeros_like, state.params)
            grads, metrics = jax.lax.scan(body, zero, (micro, keys))
            grads = jax.tree.map(lambda g: g / accum, grads)
            metrics = jax.tree.map(lambda m: jnp.mean(m), metrics)

        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.apply_gradients(
            grads, ema_rate=self.config.get("ema_rate", 0.9999)
        )
        return new_state, metrics

    # --- sampling ----------------------------------------------------------

    def sample_weights(self):
        """(ema_params, vae_params) to feed the built sample_fn.  Weights are
        ARGUMENTS, never closure constants: closed-over arrays get baked into
        the serialized program (hundreds of MB for the big models), blowing up
        compile time and remote-compile payload limits."""
        return self.state.ema_params, self.vae_params

    def build_sample_fn(self, sample_steps: Optional[int] = None, decode: bool = True):
        """One jittable function (nnet_params, vae_params, key, cond, ...) ->
        samples [+ mask].

        Covers: EM SDE/ODE for continuous tasks, DPM-Solver(++) for discrete;
        CFG fused; optional VAE decode inside the same program.  Call with
        `*trainer.sample_weights()` as the leading arguments."""
        config = self.config
        steps = sample_steps or config.sample.sample_steps
        scale = config.sample.get("scale", 0.0)
        cfg_enabled = bool(config.sample.get("cfg", False))
        from ..samplers.speed_budget import check_speed_modes

        # Guardrail: warn when an enabled speed mode exceeds (or lacks) its
        # geometry's measured deviation budget (BENCH.md round-2 table).
        check_speed_modes(config)
        z_shape = tuple(config.get("z_shape", None) or self.dataset.data_shape)
        has_vae = self.vae is not None
        # Sampling never differentiates: use the inference attention dispatch
        # (Pallas kernel where it wins) without touching the training model.
        nnet = (
            self.nnet.clone(attn_impl="infer")
            if getattr(self.nnet, "attn_impl", None) == "auto"
            else self.nnet
        )
        # Under a pp mesh, sampling also pipelines the block trunk (a model
        # big enough to need pp for training needs it at inference too); the
        # microbatch count self-adapts to eval batch sizes (incl. the CFG
        # 2x-fused batch).  napply falls back to plain apply on call patterns
        # the pipeline doesn't cover (e.g. image-only forwards of a dual
        # model inside make_pipelined_apply itself).
        if self._pipe_apply is not None:
            napply = make_pipelined_apply(
                nnet, self.mesh, num_micro=self._pp_num_micro
            )
        else:
            napply = nnet.apply

        def maybe_decode(vae_params, z):
            if decode and has_vae and vae_params is not None:
                return self.vae.apply(vae_params, z, method="decode")
            return z

        if self.task in ("pixel_sde", "latent_sde"):

            def sample_fn(params, vae_params, key, y=None, n: int = 1):
                sm = ScoreModel(
                    lambda xx, tt, **kw: napply(params, xx, tt, **kw),
                    config.pred,
                    self.sde,
                )
                kwargs = {} if y is None else {"y": y}
                k1, k2 = jax.random.split(key)
                x_init = jax.random.normal(k1, (n, *z_shape))
                if config.sample.algorithm == "euler_maruyama_sde":
                    x = euler_maruyama(k2, ReverseSDE(sm), x_init, steps, **kwargs)
                elif config.sample.algorithm == "euler_maruyama_ode":
                    x = euler_maruyama(k2, ODE(sm), x_init, steps, **kwargs)
                else:  # continuous dpm_solver (reference train.py:115-130):
                    # upstream plan semantics (coarse logSNR grid, default r's)
                    ns = NoiseScheduleVP("linear")
                    solver = DPMSolver(
                        lambda xx, tt, mask_token=None: sm.noise_pred(xx, tt, **kwargs),
                        ns, predict_x0=False,
                    )
                    x = solver.sample(x_init, steps=steps, eps=1e-4, T=1.0, order=3,
                                      method="fast_upstream", skip_type="logSNR")
                if self.task == "latent_sde":
                    x = maybe_decode(vae_params, x)
                return x

            return sample_fn

        N = self.schedule.N

        if self.task == "latent_discrete":

            def sample_fn(params, vae_params, key, y, n: int = None):
                cfg_fn = make_cfg_class_cond(
                    lambda xx, tt, yy: napply(params, xx, tt, yy),
                    null_label=config.nnet.num_classes - 1,
                    scale=scale,
                    enabled=cfg_enabled,
                )
                n = y.shape[0]
                z_init = jax.random.normal(key, (n, *z_shape))
                solver = DPMSolver(
                    lambda xx, tt, mask_token=None, cfg_on=True: cfg_fn(
                        xx, tt * N, y, cfg_on=cfg_on),
                    self.noise_schedule, predict_x0=True,
                    accel_tau=config.sample.get("accel", 0.0),
                    cfg_interval=tuple(config.sample.get("cfg_interval", ())) or None,
                )
                z = solver.sample(z_init, steps=steps, eps=1.0 / N, T=1.0, order=3,
                                  method="fast")
                return maybe_decode(vae_params, z)

            return sample_fn

        # t2i_discrete
        empty_context = np.asarray(self.dataset.empty_context)
        panoptic_on = bool(config.nnet.enable_panoptic)
        gt_mode = bool(config.nnet.get("use_ground_truth", False))

        def sample_fn(params, vae_params, key, context, panoptic=None, n: int = None):
            """panoptic: integer GT maps, required when nnet.use_ground_truth —
            the model is conditioned on the true mask and echoes it (reference
            `train_t2i_discrete.py:491-494,539`)."""
            use_gt = gt_mode and panoptic is not None

            def apply_nnet(xx, tt, cc, mask_token=None):
                if use_gt:
                    return napply(params, xx, tt, cc, mask_token=mask_token,
                                  use_ground_truth=True)
                return napply(params, xx, tt, cc, mask_token=mask_token)

            cfg_fn = make_cfg_t2i(apply_nnet, empty_context, scale=scale,
                                  enabled=cfg_enabled)
            n = context.shape[0]
            k1, k2 = jax.random.split(key)
            z_init = jax.random.normal(k1, (n, *z_shape))
            if config.sample.algorithm == "pndm":
                # Reference UNet-family sampling: SD-1.5 PNDM/PLMS scheduler,
                # mask_token FIXED across NFEs (train_t2i_discrete.py:525-534).
                from ..samplers.pndm import pndm_sample

                acp = self.schedule.cum_alphas[1:]  # diffusers-convention table

                def model_fn(xx, tt, mask_token=None):
                    return cfg_fn(xx, tt, context, mask_token=mask_token)

                if panoptic_on:
                    if use_gt:
                        # GT-conditioned mode: the mask input is the encoded
                        # ground-truth map, not noise (same as the solver
                        # branch below; reference use_ground_truth eval)
                        from ..diffusion.analog_bits import ints_to_analog

                        mask_init = ints_to_analog(
                            panoptic, n=config.nnet.mask_bits,
                            dtype=z_init.dtype,
                        )
                    else:
                        mask_init = jax.random.normal(
                            k2, (n, config.nnet.mask_size, config.nnet.mask_size,
                                 config.nnet.mask_bits)
                        )
                    z, pred_mask = pndm_sample(model_fn, z_init, steps, acp,
                                               num_train_timesteps=N,
                                               mask_token=mask_init)
                    return maybe_decode(vae_params, z), pred_mask
                z = pndm_sample(model_fn, z_init, steps, acp,
                                num_train_timesteps=N)
                return maybe_decode(vae_params, z)
            cfg_interval = tuple(config.sample.get("cfg_interval", ())) or None
            solver = DPMSolver(
                lambda xx, tt, mask_token=None, cfg_on=True, **mkw: cfg_fn(
                    xx, tt * N, context, mask_token=mask_token, cfg_on=cfg_on,
                    **mkw),
                self.noise_schedule, predict_x0=True,
                accel_tau=config.sample.get("accel", 0.0),
                cfg_interval=cfg_interval,
                # hold the CFG mask correction across unguided steps (gate
                # evidence: plain interval drifts the mask-id distribution)
                mask_guidance_hold=bool(
                    cfg_interval and panoptic_on and cfg_enabled and scale
                    and config.sample.get("cfg_interval_mask_hold", True)
                ),
            )
            if panoptic_on:
                if use_gt:
                    from ..diffusion.analog_bits import ints_to_analog

                    mask_init = ints_to_analog(
                        panoptic, n=config.nnet.mask_bits, dtype=z_init.dtype
                    )
                else:
                    mask_init = jax.random.normal(
                        k2, (n, config.nnet.mask_size, config.nnet.mask_size,
                             config.nnet.mask_bits)
                    )
                z, pred_mask = solver.sample(
                    z_init, steps=steps, eps=1.0 / N, T=1.0, order=3, method="fast",
                    mask_token=mask_init, update_mask=not use_gt,
                )
            else:
                z = solver.sample(z_init, steps=steps, eps=1.0 / N, T=1.0, order=3,
                                  method="fast")
                pred_mask = None
            x = maybe_decode(vae_params, z)
            if panoptic_on:
                return x, pred_mask
            return x

        return sample_fn

    # --- main loop ----------------------------------------------------------

    def data_stream(self, start_step: int = 0):
        # Opt-in host->device transfer compression (train.transfer_dtype =
        # "bfloat16"): float32 batch fields are cast on host before the copy,
        # halving the bytes when the link to the chip, not the loader, limits
        # the feed.  Context-like fields the bf16 model consumes directly are
        # bit-identical to the f32 feed; moments are rounded to bf16 BEFORE
        # the f32 reparameterized sample (precision comparable to the
        # reference's fp16-autocast input path, but not identical to f32).
        cast = None
        if self.config.train.get("transfer_dtype", "") == "bfloat16":
            import ml_dtypes

            cast = ml_dtypes.bfloat16
        # Panoptic id maps are bounded by the analog-bits depth (ids < 2^bits,
        # diffusion/analog_bits.py), so for the default 8-bit codec they ship
        # as uint8 — 4x fewer link bytes than int32, bit-exact (the loss casts
        # to int32 on device).  prefetch_to_device raises on out-of-range ids.
        cast_int = None
        if (
            self.task == "t2i_discrete"
            and self.config.nnet.get("enable_panoptic", False)
            and self.config.nnet.get("mask_bits", 8) <= 8
            and self.config.train.get("transfer_mask_uint8", True)
        ):
            cast_int = np.uint8
        native = self._native_stream(start_step=start_step)
        if native is not None:
            return prefetch_to_device(native, self.batch_sharding,
                                      cast_f32=cast, cast_int=cast_int,
                                      global_batch=self.config.train.batch_size)
        # seed is process-CONSISTENT: all hosts compute the same global
        # shuffle and each loads only the rows its addressable devices need
        # under the ACTUAL batch sharding (disjoint slices for data layouts;
        # the full batch when a pp axis spans hosts, where every host holds a
        # replica).  prefetch_to_device assembles the global array from them.
        from ..parallel.mesh import process_batch_slice

        loader = Loader(
            self.dataset.get_split("train", labeled=True),
            batch_size=self.config.train.batch_size,
            num_workers=self.config.get("num_workers", 8),
            seed=self.config.seed,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            local_rows=process_batch_slice(
                self.batch_sharding, self.config.train.batch_size
            ),
        )
        if start_step:
            # Deterministic data resume: index-only fast-forward so the
            # resumed run consumes exactly the batches the uninterrupted run
            # would have (one batch per optimizer step).
            loader.skip(start_step)
        return prefetch_to_device(iter(loader), self.batch_sharding,
                                  cast_f32=cast, cast_int=cast_int,
                                  global_batch=self.config.train.batch_size)

    def _native_stream(self, start_step: int = 0):
        """C++ fastloader path for MS-COCO feature dirs (native/fastloader.cpp);
        falls back to the Python loader when unavailable."""
        if self.task != "t2i_discrete" or not self.config.get("native_loader", True):
            return None
        if jax.process_count() > 1:
            from ..parallel.mesh import process_batch_slice

            s = process_batch_slice(self.batch_sharding,
                                    self.config.train.batch_size)
            if (s.stop - s.start) * jax.process_count() != self.config.train.batch_size:
                # The C++ loader's multi-process contract is DISJOINT strided
                # file subsets per process; a layout that replicates batch
                # rows across hosts (pp spanning processes) needs identical
                # rows on every host — use the Python loader's shared-shuffle
                # path instead.
                return None
        from ..data.datasets import MSCOCO256Features
        from ..data import native_loader

        if not isinstance(self.dataset, MSCOCO256Features):
            return None
        if not native_loader.available():
            return None
        train_dir = os.path.join(self.dataset.path, "train")
        if not os.path.isdir(train_dir):
            return None
        h, w, c = self.config.z_shape
        seg_probe = next(
            (n for n in os.listdir(train_dir) if n.endswith("_seg.npy")), None
        )
        mask_size = self.config.nnet.mask_size if self.config.nnet.enable_panoptic else None
        seg_in = mask_size or 0
        if seg_probe is not None:
            seg_in = np.load(os.path.join(train_dir, seg_probe)).shape[0]
        loader = native_loader.NativeFeatureLoader(
            train_dir,
            batch_size=self.config.train.batch_size,
            moments_shape=(2 * c, h, w),
            context_shape=(self.config.nnet.num_clip_token, self.config.nnet.clip_dim),
            seg_in=seg_in,
            mask_size=mask_size,
            # per-process seed is safe HERE: each process shuffles a disjoint
            # strided subset of the feature files (see NativeFeatureLoader).
            # On resume, fold the step in: the C++ loader has no index-only
            # fast-forward, so a resumed run gets a FRESH shuffle order
            # instead of replaying the start of training (the Python Loader
            # path resumes exactly via skip()).
            seed=self.config.seed + jax.process_index()
                 + 1_000_003 * int(start_step),
            num_threads=self.config.get("num_workers", 8),
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
        p_uncond = float(self.config.dataset.get("p_uncond", 0.0) or 0.0)
        empty = np.asarray(self.dataset.empty_context, dtype=np.float32)
        rng = np.random.default_rng(
            self.config.seed + jax.process_index() + int(start_step)
        )

        def stream():
            for batch in loader:
                if p_uncond > 0.0:
                    context = batch[1]
                    drop = rng.random(context.shape[0]) < p_uncond
                    context[drop] = empty
                yield batch

        logging.info("using native C++ fastloader for the input pipeline")
        return stream()

    def resume(self):
        self.state, resumed = ckpt_lib.resume(self.ckpt_root, self.state)
        return resumed

    def fit(
        self,
        eval_callback: Optional[Callable] = None,
        vis_callback: Optional[Callable] = None,
        max_steps: Optional[int] = None,
    ):
        """Train to config.train.n_steps; returns final metrics.

        eval_callback(trainer, step) runs every save_interval (FID etc.);
        vis_callback(trainer, step) every eval_interval (sample grids) — both
        live in evaluation/, kept out of the hot path."""
        config = self.config
        self.resume()
        # Stream starts AT the resumed step: the Python loader fast-forwards
        # index-only, so the resumed run sees the batches the uninterrupted
        # run would have (the reference replays its loader from scratch).
        stream = self.data_stream(start_step=int(self.state.step))
        n_steps = max_steps or config.train.n_steps
        log_interval = config.train.get("log_interval", 10)
        save_interval = config.train.get("save_interval", 50000)
        eval_interval = config.train.get("eval_interval", 0)
        metrics_hist = []
        t0 = time.time()
        # Track the step on host: state.step is a DEVICE array, and int() on it
        # would force a device->host sync EVERY step (the dispatch round-trip
        # alone is ~28 ms on tunnel backends).  apply_gradients advances the
        # device counter by exactly 1 per _train_step, so the host mirror stays
        # exact.  `inflight` bounds how far dispatch runs ahead independent of
        # log_interval: each queued step holds its h2d batch alive on device,
        # so an unbounded queue would accumulate log_interval batches of HBM.
        # Fetching a finished step's scalar overlaps with the steps after it.
        from collections import deque

        inflight: "deque" = deque()
        max_inflight = int(config.train.get("max_inflight_steps", 8))
        step = int(self.state.step)  # one sync after resume
        while step < n_steps:
            batch = next(stream)
            step_key = jax.random.fold_in(self.rng, step + 1)
            self.state, metrics = self._train_step(self.state, batch, step_key)
            step += 1
            inflight.append(metrics["loss"])
            if len(inflight) > max_inflight:
                float(inflight.popleft())  # wait for step (step - max_inflight)
            if step % log_interval == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["step"] = step
                m["steps_per_sec"] = log_interval / max(time.time() - t0, 1e-9)
                m["images_per_sec"] = m["steps_per_sec"] * config.train.batch_size
                t0 = time.time()
                metrics_hist.append(m)
                if jax.process_index() == 0:
                    logging.info(dct2str(m))
                    self._append_metrics(m)
            if vis_callback is not None and eval_interval and step % eval_interval == 0:
                vis_callback(self, step)
            if save_interval and step % save_interval == 0:
                # Saves sync anyway; cheap spot to prove the host mirror exact.
                assert int(self.state.step) == step, (int(self.state.step), step)
                if eval_callback is not None:
                    # The callback owns checkpoint retention (e.g. best-FID
                    # gating, reference `train.py:182-196`).
                    eval_callback(self, step)
                elif jax.process_index() == 0:
                    # Async: arrays are staged to host here; the directory
                    # write commits on a background thread while training
                    # continues (orbax serializes overlapping saves).
                    ckpt_lib.save_checkpoint(self.ckpt_root, self.state,
                                             block=False)
        ckpt_lib.wait_for_saves()
        return metrics_hist


    def _append_metrics(self, m: dict):
        """Structured metrics stream (workdir/metrics.jsonl) — the wandb-scalar
        role of the reference (`train.py:162`), dependency-free."""
        import json

        try:
            with open(os.path.join(self.workdir, "metrics.jsonl"), "a") as f:
                f.write(json.dumps(m) + "\n")
        except OSError:
            pass


def _merge_params_counted(params, loaded):
    """Overlay `loaded` onto `params` where paths match (strict=False load,
    reference `utils.py:383`); returns (merged, n_matched, n_loaded) so
    callers can detect layout mismatches instead of training random weights."""
    import flax.traverse_util as tu

    flat = dict(tu.flatten_dict(params))
    loaded_flat = tu.flatten_dict(loaded)
    n = 0
    for k, v in loaded_flat.items():
        if k in flat and flat[k].shape == np.asarray(v).shape:
            flat[k] = jnp.asarray(v)
            n += 1
    return tu.unflatten_dict(flat), n, len(loaded_flat)


def _merge_params(params, loaded):
    return _merge_params_counted(params, loaded)[0]
