"""Production inference API: load a config + weights once, generate batches.

The reference has no serving story (sampling is buried inside the training
scripts); this wraps the same compiled pipelines behind a small object:

    from panopticdiffusionmodels_tpu.serving import GenerationPipeline
    pipe = GenerationPipeline.from_config("mscoco_uvit_small",
                                          nnet_path="nnet_ema.pth",
                                          vae_path="autoencoder_kl.pth")
    images, masks = pipe.generate(prompts=["a bus in a city"], steps=50)

Everything after weight loading is one jitted XLA program per (batch, steps)
signature; weights are passed as arguments (never closure constants).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from absl import logging

from .configs import CONFIG_NAMES, get_config
from .diffusion import Schedule, stable_diffusion_beta_schedule
from .diffusion.analog_bits import analog_to_ints
from .diffusion.cfg import make_cfg_class_cond, make_cfg_t2i
from .models import get_nnet
from .models.vae import get_model as get_vae
from .samplers import DPMSolver, NoiseScheduleVP


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


class GenerationPipeline:
    """Text/class/unconditional image (+ panoptic mask) generation."""

    def __init__(self, config, nnet_params, vae_params=None, empty_context=None):
        self.config = config
        nnet_kwargs = dict(config.nnet)
        nnet_kwargs.pop("name")
        nnet_kwargs.pop("use_ground_truth", None)
        nnet_kwargs["dtype"] = _dtype(config.get("compute_dtype", "bfloat16"))
        if config.nnet.name != "unet_t2i" and nnet_kwargs.get("attn_impl", "auto") == "auto":
            nnet_kwargs["attn_impl"] = "infer"  # inference-only dispatch
        self.nnet = get_nnet(config.nnet.name, **nnet_kwargs)
        self.params = nnet_params
        self.vae = get_vae(
            scale_factor=config.autoencoder.scale_factor
        ) if "autoencoder" in config else None
        self.vae_params = vae_params
        self.betas = stable_diffusion_beta_schedule()
        self.schedule = Schedule(self.betas)
        self.ns = NoiseScheduleVP("discrete", betas=self.betas)
        self.is_t2i = config.nnet.name in ("uvit_t2i", "unet_t2i")
        self.panoptic = self.is_t2i and config.nnet.enable_panoptic
        if empty_context is None and self.is_t2i:
            if bool(config.sample.get("cfg", False)):
                logging.warning(
                    "serving: CFG is enabled but no empty_context was given — "
                    "guidance will extrapolate against a ZEROS context the "
                    "model never saw in training; pass empty_context_path="
                    ".../empty_context.npy for correct unconditional guidance"
                )
            empty_context = np.zeros(
                (config.nnet.num_clip_token, config.nnet.clip_dim), np.float32
            )
        self.empty_context = empty_context
        self._clip = None
        self._jitted = {}

    # --- constructors ------------------------------------------------------

    @classmethod
    def from_config(
        cls,
        config_or_name,
        nnet_path: Optional[str] = None,
        vae_path: Optional[str] = None,
        empty_context_path: Optional[str] = None,
        seed: int = 0,
    ) -> "GenerationPipeline":
        config = (
            get_config(config_or_name)
            if isinstance(config_or_name, str) and config_or_name in CONFIG_NAMES
            else config_or_name
        )
        nnet_kwargs = dict(config.nnet)
        name = nnet_kwargs.pop("name")
        nnet_kwargs.pop("use_ground_truth", None)
        nnet_kwargs["dtype"] = _dtype(config.get("compute_dtype", "bfloat16"))
        nnet = get_nnet(name, **nnet_kwargs)

        # init (one jitted program), then overlay weights
        h = config.nnet.get("img_size", None) or config.nnet.get("sample_size")
        c = config.nnet.get("in_chans", 4)
        x = jnp.zeros((1, h, h, c))
        t = jnp.zeros((1,))
        key = jax.random.PRNGKey(seed)
        if name in ("uvit_t2i", "unet_t2i"):
            ctx = jnp.zeros((1, config.nnet.num_clip_token, config.nnet.clip_dim))
            if config.nnet.enable_panoptic:
                m = jnp.zeros(
                    (1, config.nnet.mask_size, config.nnet.mask_size,
                     config.nnet.mask_bits)
                )
                params = jax.jit(
                    lambda k: nnet.init(k, x, t, ctx, mask_token=m)
                )(key)
            else:
                params = jax.jit(lambda k: nnet.init(k, x, t, ctx))(key)
        elif config.nnet.get("num_classes", -1) > 0:
            params = jax.jit(
                lambda k: nnet.init(k, x, t, jnp.zeros((1,), jnp.int32))
            )(key)
        else:
            params = jax.jit(lambda k: nnet.init(k, x, t))(key)

        if nnet_path:
            if not os.path.exists(nnet_path):
                raise FileNotFoundError(
                    f"nnet_path={nnet_path!r} does not exist — serving would "
                    "otherwise silently generate from random weights"
                )
            from .train.trainer import _merge_params_counted
            from .utils.torch_bridge import (
                convert_uvit,
                convert_uvit_t2i,
                load_torch_state_dict,
            )

            sd = load_torch_state_dict(nnet_path)
            if name == "unet_t2i":
                from .utils.ldm_bridge import convert_ldm_unet

                loaded = convert_ldm_unet(
                    sd,
                    channel_mult=tuple(config.nnet.channel_mult),
                    num_res_blocks=config.nnet.num_res_blocks,
                )
            else:
                conv = convert_uvit_t2i if name == "uvit_t2i" else convert_uvit
                kwargs = dict(
                    depth=config.nnet.depth,
                    mlp_time_embed=config.nnet.mlp_time_embed,
                    scan_blocks=config.nnet.get("scan_blocks", False),
                )
                if name == "uvit":
                    kwargs["num_classes"] = config.nnet.get("num_classes", -1)
                else:
                    kwargs["enable_panoptic"] = config.nnet.get("enable_panoptic", True)
                    kwargs["separate"] = config.nnet.get("separate", True)
                loaded = conv(sd, **kwargs)
            params, n_ok, n_all = _merge_params_counted(params, loaded)
            if n_ok == 0:
                raise ValueError(
                    f"{nnet_path!r} matched ZERO parameters — layout mismatch "
                    "(check scan_blocks/enable_panoptic/separate)"
                )

        vae_params = None
        if vae_path and os.path.exists(vae_path):
            from .utils.torch_bridge import (
                convert_autoencoder_kl,
                load_torch_state_dict,
            )

            vae_params = convert_autoencoder_kl(load_torch_state_dict(vae_path))

        empty_context = None
        if empty_context_path and os.path.exists(empty_context_path):
            empty_context = np.load(empty_context_path)

        return cls(config, params, vae_params, empty_context)

    # --- generation --------------------------------------------------------

    def _pipeline(self, n: int, steps: int):
        config = self.config
        N = self.schedule.N
        scale = config.sample.get("scale", 0.0)
        cfg_enabled = bool(config.sample.get("cfg", False))
        accel_tau = float(config.sample.get("accel", 0.0))
        cfg_interval = tuple(config.sample.get("cfg_interval", ())) or None
        # The speed-mode knobs are baked into the compiled program, so they
        # are part of the cache key — mutating config.sample after a generate
        # call correctly triggers a recompile instead of silently reusing the
        # old program.
        task = config.get("task", "")
        algorithm = config.sample.get("algorithm", "dpm_solver")
        key_shape = (n, steps, scale, cfg_enabled, accel_tau, cfg_interval,
                     bool(config.sample.get("cfg_interval_mask_hold", True)),
                     algorithm, task)
        if key_shape in self._jitted:
            return self._jitted[key_shape]
        # Guardrail check on the build-miss path only: one warning per
        # compiled program, not per generate() call.
        from .samplers.speed_budget import check_speed_modes

        check_speed_modes(config)
        hw = config.nnet.get("img_size", None) or config.nnet.get("sample_size")
        z_shape = tuple(config.get("z_shape", (hw, hw, config.nnet.get("in_chans", 4))))

        def decode(vae_params, z):
            if self.vae is not None and vae_params is not None:
                return self.vae.apply(vae_params, z, method="decode")
            return z

        if task in ("pixel_sde", "latent_sde"):
            # Continuous VP-SDE configs (CIFAR/CelebA/ImageNet-64 + train_ldm):
            # the discrete solver below would silently sample with the wrong
            # schedule/time scaling.  Mirrors Trainer.build_sample_fn.
            from .diffusion.sde import ODE, ReverseSDE, ScoreModel, VPSDE
            from .samplers import euler_maruyama

            sde = VPSDE()
            pred = config.get("pred", "noise_pred")

            def fn(params, vae_params, key, cond):
                sm = ScoreModel(
                    lambda xx, tt, **kw: self.nnet.apply(params, xx, tt, **kw),
                    pred, sde,
                )
                kwargs = {} if cond is None else {"y": cond}
                k1, k2 = jax.random.split(key)
                x = jax.random.normal(k1, (n, *z_shape))
                if algorithm == "euler_maruyama_sde":
                    x = euler_maruyama(k2, ReverseSDE(sm), x, steps, **kwargs)
                elif algorithm == "euler_maruyama_ode":
                    x = euler_maruyama(k2, ODE(sm), x, steps, **kwargs)
                else:  # continuous DPM-Solver: upstream plan (CLAUDE.md)
                    ns = NoiseScheduleVP("linear")
                    solver = DPMSolver(
                        lambda xx, tt, mask_token=None: sm.noise_pred(xx, tt, **kwargs),
                        ns, predict_x0=False,
                    )
                    x = solver.sample(x, steps=steps, eps=1e-4, T=1.0, order=3,
                                      method="fast_upstream", skip_type="logSNR")
                return decode(vae_params, x)

            jitted = jax.jit(fn)
            self._jitted[key_shape] = jitted
            return jitted

        if algorithm == "pndm":
            # SD-1.5 PNDM/PLMS (the reference's UNet-family sampler);
            # accel/cfg_interval do not apply to this scheduler.
            if accel_tau or cfg_interval is not None:
                logging.warning(
                    "serving: sample.accel / sample.cfg_interval are "
                    "DPM-Solver speed modes and have no effect with "
                    "algorithm='pndm' — ignoring them"
                )
            assert self.is_t2i, "pndm serving supports the t2i families"
            from .samplers.pndm import pndm_sample

            acp = self.schedule.cum_alphas[1:]
            empty = jnp.asarray(self.empty_context)

            def fn(params, vae_params, key, context):
                cfg_fn = make_cfg_t2i(
                    lambda xx, tt, cc, mask_token=None: self.nnet.apply(
                        params, xx, tt, cc, mask_token=mask_token
                    ),
                    empty, scale=scale, enabled=cfg_enabled,
                )

                def model_fn(xx, tt, mask_token=None):
                    return cfg_fn(xx, tt, context, mask_token=mask_token)

                k1, k2 = jax.random.split(key)
                z = jax.random.normal(k1, (n, *z_shape))
                if self.panoptic:
                    m0 = jax.random.normal(
                        k2, (n, config.nnet.mask_size, config.nnet.mask_size,
                             config.nnet.mask_bits)
                    )
                    z0, pred_mask = pndm_sample(model_fn, z, steps, acp,
                                                num_train_timesteps=N,
                                                mask_token=m0)
                    return decode(vae_params, z0), pred_mask
                z0 = pndm_sample(model_fn, z, steps, acp, num_train_timesteps=N)
                return decode(vae_params, z0)

            jitted = jax.jit(fn)
            self._jitted[key_shape] = jitted
            return jitted

        if algorithm not in ("dpm_solver", ""):
            raise NotImplementedError(
                f"serving does not support sample.algorithm={algorithm!r} for "
                f"task={task!r}; use Trainer.build_sample_fn"
            )

        if self.is_t2i:
            empty = jnp.asarray(self.empty_context)

            def fn(params, vae_params, key, context):
                cfg_fn = make_cfg_t2i(
                    lambda xx, tt, cc, mask_token=None: self.nnet.apply(
                        params, xx, tt, cc, mask_token=mask_token
                    ),
                    empty, scale=scale, enabled=cfg_enabled,
                )
                solver = DPMSolver(
                    lambda xx, tt, mask_token=None, cfg_on=True, **mkw: cfg_fn(
                        xx, tt * N, context, mask_token=mask_token, cfg_on=cfg_on,
                        **mkw
                    ),
                    self.ns, predict_x0=True,
                    accel_tau=accel_tau, cfg_interval=cfg_interval,
                    mask_guidance_hold=bool(
                        cfg_interval and self.panoptic and cfg_enabled and scale
                        and config.sample.get("cfg_interval_mask_hold", True)
                    ),
                )
                k1, k2 = jax.random.split(key)
                z = jax.random.normal(k1, (n, *z_shape))
                if self.panoptic:
                    m0 = jax.random.normal(
                        k2, (n, config.nnet.mask_size, config.nnet.mask_size,
                             config.nnet.mask_bits)
                    )
                    z0, pred_mask = solver.sample(
                        z, steps=steps, eps=1.0 / N, T=1.0, order=3,
                        method="fast", mask_token=m0,
                    )
                    return decode(vae_params, z0), pred_mask
                z0 = solver.sample(z, steps=steps, eps=1.0 / N, T=1.0, order=3,
                                   method="fast")
                return decode(vae_params, z0)

        elif config.nnet.get("num_classes", -1) > 0:

            def fn(params, vae_params, key, y):
                cfg_fn = make_cfg_class_cond(
                    lambda xx, tt, yy: self.nnet.apply(params, xx, tt, yy),
                    null_label=config.nnet.num_classes - 1,
                    scale=scale, enabled=cfg_enabled,
                )
                solver = DPMSolver(
                    lambda xx, tt, mask_token=None, cfg_on=True: cfg_fn(
                        xx, tt * N, y, cfg_on=cfg_on),
                    self.ns, predict_x0=True,
                    accel_tau=accel_tau, cfg_interval=cfg_interval,
                )
                z = jax.random.normal(key, (n, *z_shape))
                z0 = solver.sample(z, steps=steps, eps=1.0 / N, T=1.0, order=3,
                                   method="fast")
                return decode(vae_params, z0)

        else:

            def fn(params, vae_params, key, _):
                # no CFG wrapper here, so cfg_interval does not apply; the
                # model-agnostic forecast-skip accel still does.
                solver = DPMSolver(
                    lambda xx, tt, mask_token=None: self.nnet.apply(
                        params, xx, tt * N
                    ),
                    self.ns, predict_x0=True, accel_tau=accel_tau,
                )
                z = jax.random.normal(key, (n, *z_shape))
                z0 = solver.sample(z, steps=steps, eps=1.0 / N, T=1.0, order=3,
                                   method="fast")
                return decode(vae_params, z0)

        jitted = jax.jit(fn)
        self._jitted[key_shape] = jitted
        return jitted

    def encode_prompts(self, prompts: Sequence[str]) -> np.ndarray:
        if self._clip is None:
            from .models.clip import FrozenCLIPEmbedder

            self._clip = FrozenCLIPEmbedder()
        return self._clip.encode(list(prompts))

    def _prep_cond(self, prompts, contexts, labels, n):
        """-> (cond array or None, batch size)."""
        if prompts is not None:
            contexts = self.encode_prompts(prompts)
        if contexts is not None:
            cond = jnp.asarray(contexts)
            return cond, cond.shape[0]
        if labels is not None:
            cond = jnp.asarray(np.asarray(labels, np.int32))
            return cond, cond.shape[0]
        assert n is not None, "need prompts, contexts, labels or n"
        return None, n

    def _postprocess(self, out):
        """Device outputs -> numpy [0,1] images (+ integer panoptic-id maps)."""
        if self.panoptic:
            images, pred_mask = out
            ids = np.asarray(analog_to_ints(pred_mask,
                                            n=self.config.nnet.mask_bits))
            images01 = np.clip((np.asarray(images, np.float32) + 1) / 2, 0, 1)
            return images01, ids
        images01 = np.clip((np.asarray(out, np.float32) + 1) / 2, 0, 1)
        return images01

    def generate(
        self,
        prompts: Optional[Sequence[str]] = None,
        contexts: Optional[np.ndarray] = None,
        labels: Optional[Sequence[int]] = None,
        n: Optional[int] = None,
        steps: Optional[int] = None,
        seed: int = 0,
    ):
        """Returns images in [0,1] NHWC (numpy), plus integer panoptic-id maps
        for panoptic models: (images, mask_ids)."""
        steps = steps or self.config.sample.sample_steps
        cond, n = self._prep_cond(prompts, contexts, labels, n)
        fn = self._pipeline(n, steps)
        key = jax.random.PRNGKey(seed)
        out = fn(self.params, self.vae_params, key, cond)
        return self._postprocess(out)

    def generate_batches(self, batches, steps: Optional[int] = None,
                         seed: int = 0):
        """Bulk generation with dispatch one batch deep.

        `batches`: iterable of dicts with generate()'s conditioning keys
        (prompts= / contexts= / labels= / n=).  Yields one generate()-shaped
        result per input batch, in order — but batch i+1 is already running
        on device while batch i's outputs are fetched, decoded from analog
        bits and converted on host (jax async dispatch), so bulk throughput
        approaches the raw pipeline rate instead of alternating device/host.
        Reuses one compiled program per distinct (batch size, steps).

        Determinism: batch i samples with fold_in(PRNGKey(seed), i), so runs
        are reproducible in (seed, batch index) — but batch 0 is intentionally
        NOT the same draw as generate(seed=seed), which uses PRNGKey(seed)
        directly."""
        from .utils import one_deep

        steps = steps or self.config.sample.sample_steps
        base = jax.random.PRNGKey(seed)

        def dispatch(ikw):
            i, kw = ikw
            cond, n = self._prep_cond(
                kw.get("prompts"), kw.get("contexts"), kw.get("labels"),
                kw.get("n"),
            )
            fn = self._pipeline(n, steps)
            return fn(self.params, self.vae_params, jax.random.fold_in(base, i), cond)

        for _, out in one_deep(enumerate(batches), dispatch):
            yield self._postprocess(out)
