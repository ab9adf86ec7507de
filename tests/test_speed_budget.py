"""Per-geometry speed-mode guardrails (samplers/speed_budget.py): enabling a
mode beyond its geometry's measured deviation budget — or on an unmeasured
geometry — must warn; validated configurations must stay silent."""
from panopticdiffusionmodels_tpu.configs import get_config
from panopticdiffusionmodels_tpu.samplers.speed_budget import check_speed_modes


def test_exact_protocol_never_warns():
    config = get_config("mscoco_uvit_large")
    assert check_speed_modes(config, log=False) == []


def test_validated_modes_stay_silent():
    # 256-res panoptic: gelu + accel<=0.2 (cfg_interval is demoted there)
    config = get_config("mscoco_uvit_small")
    config.sample.accel = 0.2
    config.nnet.gelu_approx = True
    assert check_speed_modes(config, log=False) == []
    # 512-res panoptic: only gelu is validated (round-5 own-geometry gate)
    config = get_config("mscoco_uvit_small_512")
    config.nnet.gelu_approx = True
    assert check_speed_modes(config, log=False) == []
    # image-only flagship: gelu + accel<=0.2 (the round-5 recommended pair,
    # flagship-scale gate PASS at 1.57x the 25-NFE control)
    config = get_config("imagenet256_uvit_large")
    config.sample.accel = 0.2
    config.nnet.gelu_approx = True
    assert check_speed_modes(config, log=False) == []


def test_flagship_interval_demoted():
    """Round-5 flagship-scale gate: interval=(0.0,0.5) alone shifts the
    trained latent distribution 36.7x the 25-NFE control (the armed latent
    pattern-match channel) — enabling an interval on the image flagship
    must warn and point at the validated pair."""
    config = get_config("imagenet256_uvit_large")
    config.sample.cfg_interval = (0.0, 0.5)
    warnings = check_speed_modes(config, log=False)
    assert len(warnings) == 1 and "not validated" in warnings[0]
    assert "gelu_approx" in warnings[0]


def test_panoptic_interval_demoted():
    """Round-3 trained distribution gate: every guidance interval shifts the
    mask-id distribution well past the seed floor — enabling one on a
    panoptic geometry must warn and point at the validated alternative."""
    for name in ("mscoco_uvit_small", "mscoco_uvit_large"):
        config = get_config(name)
        config.sample.cfg_interval = (0.0, 0.5)
        warnings = check_speed_modes(config, log=False)
        assert len(warnings) == 1 and "not validated" in warnings[0], name
        assert "gelu_approx" in warnings[0]  # names the validated substitute


def test_512_panoptic_accel_demoted():
    """Round-5 own-geometry gate (trained_panoptic_512): the armed latent
    pattern-match channel fails accel at ANY tau (0.2 at 14.0x, 0.1 at
    5.5x the 25-NFE control) while the 256-res gate passes it — resolution
    is part of a mode's validity domain, so enabling accel on the 512
    config must warn."""
    config = get_config("mscoco_uvit_small_512")
    config.sample.accel = 0.1
    warnings = check_speed_modes(config, log=False)
    assert len(warnings) == 1 and "EXCEEDS" in warnings[0]


def test_large_panoptic_accel_over_budget_warns():
    """The round-2 measurement: accel=0.2 on mscoco_uvit_large produced 13.4%
    mask deviation — a user enabling it must be told."""
    config = get_config("mscoco_uvit_large")
    config.sample.accel = 0.2
    warnings = check_speed_modes(config, log=False)
    assert len(warnings) == 1 and "EXCEEDS" in warnings[0]
    # its validated ceiling passes silently
    config.sample.accel = 0.1
    assert check_speed_modes(config, log=False) == []


def test_large_panoptic_gelu_accel_is_validated():
    config = get_config("mscoco_uvit_large")
    config.sample.accel = 0.1
    config.nnet.gelu_approx = True
    assert check_speed_modes(config, log=False) == []


def test_excess_accel_warns_on_imagenet_large():
    config = get_config("imagenet256_uvit_large")
    config.sample.accel = 0.3  # measured 2.1-2.4% > 2% budget
    warnings = check_speed_modes(config, log=False)
    assert len(warnings) == 1 and "EXCEEDS" in warnings[0]


def test_unmeasured_geometry_warns():
    config = get_config("imagenet256_uvit_huge")  # H: no deviation entry
    config.sample.accel = 0.2
    warnings = check_speed_modes(config, log=False)
    assert len(warnings) == 1 and "NO measured deviation entry" in warnings[0]
