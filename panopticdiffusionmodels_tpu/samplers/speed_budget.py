"""Per-geometry guardrails for the opt-in sampling speed modes.

The speed modes (`sample.accel` forecast-skip, `sample.cfg_interval` limited
guidance, `nnet.gelu_approx`) were deviation-measured per model geometry on
real TPU hardware (BENCH.md, round 2): the SAME `accel=0.2` that deviates
~1% on U-ViT-S/L image trajectories produces 13.4% mask deviation / 4.2%
analog-bit flips on the deep panoptic large model.  A mode is only as safe as
its measurement, so enabling one on a geometry where it exceeded the budget —
or was never measured — logs a loud warning instead of silently degrading
outputs (round-2 verdict: "large-geometry speed modes are known-bad but
unguarded").

Budgets (from BENCH.md's accepted-noise discussion): relative image deviation
<= 2% and analog-bit flips <= 2% vs the exact 50-NFE trajectory.  Round 3
added DISTRIBUTION-level evidence on trained weights (scripts/quality_gate.py:
Inception-FD + mask-id-histogram TV vs the seed-to-seed noise floor), which
superseded one round-2 pixel verdict: cfg_interval is demoted on panoptic
geometries (every interval shifts the trained mask-id distribution 4.7-10.3x
the seed floor, while a 25-NFE control passes at 0.9x — the shift is real,
not gate noise).  The mask-guidance hold (`sample.cfg_interval_mask_hold`)
was then gated as a re-promotion candidate and REJECTED: it is a no-op for
the standard (0.0, 0.5) orientation (the unguided segment precedes any
cached correction — outputs bit-identical to the plain interval) and for
the guide-early orientation it cuts the drift ~35% but still FAILs at ~3x
the 25-NFE control's own shift (BENCH.md "Mask-guidance hold").  The
demotion stands with the hold evidence closed.

Round 5 extended the demotion to the IMAGE flagship: the armed latent
pattern-match channel on the flagship-scale trained instance measures
interval=(0.0,0.5) alone at 36.7x the 25-NFE control (the full combo at
36.3x — the interval is the entire failure) while gelu+accel=0.2 passes
at 1.57x.  Round 5 also gated the 512-res panoptic geometry on its OWN
trained instance and demoted accel there at any tau (latent channel 5.5x
/ 14x the control; mask channel passes — worst-of-armed rules).  The
recommended configurations: gelu+accel=0.2 on the 256-res geometries,
gelu only at 512 res; no interval anywhere (quality_gate/*/report.json).
"""
from __future__ import annotations

from typing import List, Optional

from absl import logging

# Validated ceilings per geometry, keyed by
# (nnet family, embed_dim, depth, enable_panoptic, img_size).
# img_size entered the key in round 5: the SAME dual-stream S/2 network is
# gate-PASS for accel at 256 res but gate-FAIL at 512 res (the armed latent
# pattern-match channel measures accel=0.2 at 14x / accel=0.1 at 5.5x the
# 25-NFE control's drift on the 512-geo trained instance, N=1024 —
# quality_gate/trained_panoptic_512/report.json), so resolution is part of
# a mode's validity domain.
# `max_accel`: largest forecast-skip tau whose measured deviation stayed
# within budget (None = accel never measured in budget on this geometry);
# `interval_ok` / `gelu_ok`: those modes measured within budget.
# Sources: BENCH.md round-2 tables (headline, panoptic modes, large panoptic,
# 512 panoptic, secondary protocols).
_VALIDATED = {
    # ImageNet U-ViT-L/2 and L/4 (same network; accel 0.3 measured at
    # 2.1-2.4% rel dev -> over budget, 0.2 at ~1.2%).
    # cfg_interval DEMOTED (round 5): on the FLAGSHIP-SCALE trained
    # instance the armed latent pattern-match channel measures
    # interval=(0.0,0.5) ALONE at 36.7x the 25-NFE control's shift (the
    # interval+accel+gelu combo is 36.3x — the interval is the entire
    # failure), while gelu_accel=0.2 sits at 1.57x (PASS).  The round-3
    # S-scale interval PASS was carried by channels round 4 proved weakly
    # armed; no sharp-channel PASS for a guidance interval exists on ANY
    # geometry (quality_gate/trained_L/report.json; BENCH.md round 5).
    ("uvit", 1024, 20, False, 32): dict(max_accel=0.2, interval_ok=False, gelu_ok=True),
    # ImageNet-512 L/4: same network as L/2 at the same 258 tokens (patch 4
    # on 64px latents) — shares the flagship trajectory measurements.
    ("uvit", 1024, 20, False, 64): dict(max_accel=0.2, interval_ok=False, gelu_ok=True),
    # Panoptic U-ViT-S/2 at 256 res: accel 0.2 -> 1.35% bit flips,
    # and the round-3 TRAINED dual-stream distribution gate confirms
    # accel=0.2 (mask-id TV 1.75x seed floor, PASS) and gelu (0.17x).
    # cfg_interval DEMOTED (round 3): every interval tried shifts the
    # mask-id distribution 4.7-10.3x the seed floor on trained weights —
    # the solver's mask stream is CFG-extrapolated at every step, so any
    # guidance gap drifts the mask ids (quality_gate/trained_panoptic).
    ("uvit_t2i", 512, 12, True, 32): dict(max_accel=0.2, interval_ok=False, gelu_ok=True),
    # Panoptic S/2 at 512 res: accel DEMOTED at any tau (round 5).  The
    # gate trained AT THIS GEOMETRY (mask loss 0.0032) passes accel on the
    # mask channel (1.64x ctrl) but its armed latent pattern-match channel
    # measures accel=0.2 at 14.0x and accel=0.1 at 5.5x the 25-NFE
    # control's latent drift (N=1024, stable across an N=512 replication) —
    # ~3/4 of a 10-NFE protocol cut.  Only gelu is validated here.
    ("uvit_t2i", 512, 12, True, 64): dict(max_accel=None, interval_ok=False, gelu_ok=True),
    # t2i-only S model: image stream only, shares the image-stream
    # trajectory measurements.  interval demoted with the flagship
    # evidence (round 5): both sharp-channel gate measurements of a
    # guidance interval (panoptic mask TV, flagship latent TV) FAIL, and
    # the S-scale image PASS rested on weakly-armed channels.
    ("uvit_t2i", 512, 12, False, 32): dict(max_accel=0.2, interval_ok=False, gelu_ok=True),
    # Panoptic U-ViT-L: accel 0.2 measured at 13.4% mask dev / 4.2% bit
    # flips (over budget); interval demoted with the S-model gate evidence
    # (same mask-stream mechanism, deeper model measured MORE sensitive).
    ("uvit_t2i", 1024, 20, True, 32): dict(max_accel=0.1, interval_ok=False, gelu_ok=True),
}


def _geometry_key(config):
    nnet = config.nnet
    name = nnet.get("name", "")
    family = "uvit_t2i" if name in ("uvit_t2i", "unet_t2i") else "uvit"
    return (
        family,
        int(nnet.get("embed_dim", 0)),
        int(nnet.get("depth", 0)),
        bool(nnet.get("enable_panoptic", False)),
        int(nnet.get("img_size", 0)),
    )


def check_speed_modes(config, log: bool = True) -> List[str]:
    """Validate the config's enabled speed modes against the measured
    per-geometry deviation table; returns (and logs) the warnings."""
    accel = float(config.sample.get("accel", 0.0) or 0.0)
    interval = tuple(config.sample.get("cfg_interval", ()) or ())
    gelu = bool(config.nnet.get("gelu_approx", False))
    if not (accel or interval or gelu):
        return []
    warnings: List[str] = []
    key = _geometry_key(config)
    entry: Optional[dict] = _VALIDATED.get(key)
    label = (
        f"geometry (family={key[0]}, embed_dim={key[1]}, depth={key[2]}, "
        f"panoptic={key[3]}, img_size={key[4]})"
    )
    if entry is None:
        modes = ", ".join(
            m for m, on in (
                (f"accel={accel}", accel),
                (f"cfg_interval={interval}", interval),
                ("gelu_approx", gelu),
            ) if on
        )
        warnings.append(
            f"speed modes [{modes}] have NO measured deviation entry for "
            f"{label} — outputs may deviate more than the documented ~1%; "
            "measure with scripts/bench_speed_modes.py before shipping"
        )
    else:
        if accel and (entry["max_accel"] is None or accel > entry["max_accel"] + 1e-9):
            validated = (
                f"validated ceiling is accel={entry['max_accel']}"
                if entry["max_accel"] else "no accel value is validated"
            )
            warnings.append(
                f"sample.accel={accel} EXCEEDS the measured deviation budget "
                f"for {label} ({validated}; BENCH.md) — expect degraded "
                "outputs (e.g. 13.4% mask deviation on the panoptic large "
                "model at accel=0.2)"
            )
        if interval and not entry.get("interval_ok", False):
            warnings.append(
                f"sample.cfg_interval={interval} is not validated for {label}"
                " — every sharp-channel gate measurement of a guidance"
                " interval FAILs: panoptic mask-id TV 4.7-10.3x the seed"
                " floor (round 3) and flagship latent TV 36.7x the 25-NFE"
                " control (round 5, interval alone). Use gelu_approx +"
                " accel instead."
            )
        if gelu and not entry.get("gelu_ok", False):
            warnings.append(f"nnet.gelu_approx is not validated for {label}")
    if log:
        for w in warnings:
            logging.warning(w)
    return warnings
