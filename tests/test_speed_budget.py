"""Per-geometry speed-mode guardrails (samplers/speed_budget.py): enabling a
mode beyond its geometry's measured deviation budget — or on an unmeasured
geometry — must warn; validated configurations must stay silent."""
from panopticdiffusionmodels_tpu.configs import get_config
from panopticdiffusionmodels_tpu.samplers.speed_budget import check_speed_modes


def test_exact_protocol_never_warns():
    config = get_config("mscoco_uvit_large")
    assert check_speed_modes(config, log=False) == []


def test_validated_modes_stay_silent():
    for name in ("mscoco_uvit_small", "imagenet256_uvit_large",
                 "mscoco_uvit_small_512"):
        config = get_config(name)
        config.sample.accel = 0.2
        config.sample.cfg_interval = (0.0, 0.5)
        config.nnet.gelu_approx = True
        assert check_speed_modes(config, log=False) == [], name


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


def test_large_panoptic_interval_only_is_validated():
    config = get_config("mscoco_uvit_large")
    config.sample.cfg_interval = (0.0, 0.5)
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
