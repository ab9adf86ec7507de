"""Host-side logic of the distribution-level quality gate
(scripts/quality_gate.py): spec parsing, report verdict math over synthetic
statistics, and the coupled class assets the trained_panoptic geometry
learns.  The on-chip evidence lives in quality_gate/*/report.json + BENCH.md."""
import importlib.util
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def qg():
    spec = importlib.util.spec_from_file_location(
        "quality_gate", os.path.join(REPO, "scripts", "quality_gate.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_parse_spec(qg):
    # (accel, interval, gelu, steps, mask_guidance_hold)
    assert qg.parse_spec("exactA") == (0.0, None, False, 50, False)
    assert qg.parse_spec("gelu") == (0.0, None, True, 50, False)
    assert qg.parse_spec("accel=0.2") == (0.2, None, False, 50, False)
    assert qg.parse_spec("gelu_accel=0.2") == (0.2, None, True, 50, False)
    assert qg.parse_spec("interval=0.0,0.5") == (0.0, (0.0, 0.5), False, 50, False)
    assert qg.parse_spec("ihold=0.5,1.0") == (0.0, (0.5, 1.0), False, 50, True)
    assert qg.parse_spec("combo=0.2:0.0,0.5") == (0.2, (0.0, 0.5), False, 50, False)
    assert qg.parse_spec("full=0.3:0.1,0.6") == (0.3, (0.1, 0.6), True, 50, False)
    assert qg.parse_spec("full_hold=0.2:0.5,1.0") == (0.2, (0.5, 1.0), True, 50, True)
    assert qg.parse_spec("steps=25") == (0.0, None, False, 25, False)
    with pytest.raises(SystemExit):
        qg.parse_spec("bogus=1")


def _write_run(out_dir, spec, mu, sigma, mask_hist=None, n=256):
    np.savez(
        os.path.join(out_dir, f"{spec.replace(':', '_').replace(',', '-')}.npz"),
        mu=mu, sigma=sigma,
        mask_hist=np.zeros(256, np.int64) if mask_hist is None else mask_hist,
        n=n, wall=1.0, spec=spec,
    )


def test_report_verdicts(qg, tmp_path, capsys):
    """PASS <= 2x floor, MARGINAL 2-5x, FAIL > 5x — on analytic Gaussians
    where the Frechet distance is exact: FD between two d-dim standard
    normals with mean offset delta is d*delta^2 (same covariance).  The
    dose controls (steps=25 PASS, steps=10 FAIL) arm the FD channel."""
    d = 8
    rs = np.random.RandomState(0)
    sigma = np.eye(d)
    out = str(tmp_path)

    def mu_off(delta):
        return np.full(d, delta)

    # exact seeds: pairwise FD = d * 0.01^2 = 8e-4 each -> floor = 8e-4
    _write_run(out, "exactA", mu_off(0.00), sigma)
    _write_run(out, "exactB", mu_off(0.01), sigma)
    # NFE dose-response: 25-NFE within floor, 10-NFE far beyond -> FD armed
    _write_run(out, "steps=25", mu_off(0.01), sigma)       # 1.0x floor
    _write_run(out, "steps=10", mu_off(0.10), sigma)       # 100x -> FAIL
    # modes at known multiples of the floor
    _write_run(out, "modepass", mu_off(0.01), sigma)       # 1.0x floor
    _write_run(out, "modemarginal", mu_off(0.018), sigma)  # 3.24x
    _write_run(out, "modefail", mu_off(0.05), sigma)       # 25x
    qg.report("testgeo", out)
    with open(os.path.join(out, "report.json")) as f:
        rep = json.load(f)
    assert rep["fd_floor"] == pytest.approx(8e-4, rel=1e-6)
    assert rep["report_armed"] is True
    assert rep["channels"]["image"] == {
        "armed": True, "control_verdict": "PASS", "armed_at_steps": 10}
    assert rep["modes"]["modepass"]["verdict"] == "PASS"
    assert rep["modes"]["modemarginal"]["verdict"] == "MARGINAL"
    assert rep["modes"]["modefail"]["verdict"] == "FAIL"
    assert rep["modes"]["modefail"]["fd"] == pytest.approx(8 * 0.05 ** 2, rel=1e-6)
    assert rep["modes"]["steps=10"]["role"] == "control"
    del rs


def test_report_unarmed_without_dose_response(qg, tmp_path):
    """Round-4's hardest lesson institutionalized: without NFE dose-response
    evidence on THIS instance, a clean-looking mode gets UNARMED, not PASS —
    the rubber-stamp failure mode is structurally impossible."""
    d = 8
    sigma = np.eye(d)
    out = str(tmp_path)
    _write_run(out, "exactA", np.zeros(d), sigma)
    _write_run(out, "exactB", np.full(d, 0.01), sigma)
    _write_run(out, "modeclean", np.full(d, 0.01), sigma)  # 1.0x floor
    qg.report("testgeo", out)
    with open(os.path.join(out, "report.json")) as f:
        rep = json.load(f)
    assert rep["report_armed"] is False
    assert rep["channels"]["image"]["armed"] is False
    # the channel measurement is still recorded, but carries no authority
    assert rep["modes"]["modeclean"]["channel_verdicts"]["image"] == "PASS"
    assert rep["modes"]["modeclean"]["verdict"] == "UNARMED"


def test_report_unarmed_when_channel_misses_doses(qg, tmp_path):
    """A channel whose sub-control doses all PASS (the round-4 trained-
    instance KID blind spot: a 3-NFE control scored 0.00x) must not arm —
    even with the control present and passing."""
    d = 8
    sigma = np.eye(d)
    out = str(tmp_path)
    _write_run(out, "exactA", np.zeros(d), sigma)
    _write_run(out, "exactB", np.full(d, 0.01), sigma)
    _write_run(out, "steps=25", np.full(d, 0.01), sigma)  # PASS
    _write_run(out, "steps=10", np.full(d, 0.012), sigma)  # 1.44x -> PASS too
    _write_run(out, "modeclean", np.full(d, 0.01), sigma)
    qg.report("testgeo", out)
    with open(os.path.join(out, "report.json")) as f:
        rep = json.load(f)
    assert rep["channels"]["image"]["armed"] is False
    assert rep["channels"]["image"]["armed_at_steps"] is None
    assert rep["modes"]["modeclean"]["verdict"] == "UNARMED"


def test_report_mask_tv(qg, tmp_path):
    """Panoptic runs add a mask-id histogram total-variation proxy; a mode
    whose histogram shifts far beyond the seed floor must FAIL even when the
    image FD passes."""
    d = 4
    sigma = np.eye(d)
    out = str(tmp_path)
    base = np.zeros(256, np.int64)
    base[:4] = [700, 100, 100, 100]
    jitter = base.copy()
    jitter[:4] = [690, 110, 100, 100]  # TV floor = 0.01
    shifted = base.copy()
    shifted[:4] = [100, 700, 100, 100]  # TV = 0.6 >> 5x floor
    _write_run(out, "exactA", np.zeros(d), sigma, mask_hist=base)
    _write_run(out, "exactB", np.zeros(d), sigma, mask_hist=jitter)
    # dose-response arms the mask channel (25-NFE at the floor, 10-NFE FAILs)
    _write_run(out, "steps=25", np.zeros(d), sigma, mask_hist=jitter)
    _write_run(out, "steps=10", np.zeros(d), sigma, mask_hist=shifted)
    _write_run(out, "modeshift", np.zeros(d), sigma, mask_hist=shifted)
    qg.report("testgeo", out)
    with open(os.path.join(out, "report.json")) as f:
        rep = json.load(f)
    assert rep["tv_floor"] == pytest.approx(0.01)
    # the image FD channel sees nothing anywhere -> it never fires a dose,
    # so it stays unarmed; the mask channel alone carries the verdict
    assert rep["channels"]["image"]["armed"] is False
    assert rep["channels"]["mask"]["armed"] is True
    mode = rep["modes"]["modeshift"]
    assert mode["fd"] == pytest.approx(0.0, abs=1e-12)
    assert mode["mask_tv"] == pytest.approx(0.6)
    assert mode["verdict"] == "FAIL"


def _write_acts_run(out_dir, spec, acts, n=None):
    acts = np.asarray(acts, np.float32)
    np.savez(
        os.path.join(out_dir, f"{spec.replace(':', '_').replace(',', '-')}.npz"),
        mu=acts.mean(0), sigma=np.cov(acts, rowvar=False),
        mask_hist=np.zeros(256, np.int64),
        n=len(acts) if n is None else n, wall=1.0, spec=spec, acts=acts,
    )


def test_report_kid_channel_armed(qg, tmp_path):
    """When runs carry raw activations the image verdict comes from KID.
    Regime d > N (the real gate's D=2048, N=1024): a mean shift that the
    bias-floored FD channel scores BELOW the seed floor must still FAIL the
    KID channel — this is exactly the 10-NFE positive control that slipped
    through the FD-only gate."""
    d, n = 512, 256
    rs = np.random.RandomState(0)
    a = rs.normal(size=(n, d))
    b = rs.normal(size=(n, d))
    shifted = rs.normal(size=(n, d)) + 0.15
    out = str(tmp_path)
    _write_acts_run(out, "exactA", a)
    _write_acts_run(out, "exactB", b)
    # dose-response arms the KID channel on this synthetic "instance"
    _write_acts_run(out, "steps=25", rs.normal(size=(n, d)))
    _write_acts_run(out, "steps=10", rs.normal(size=(n, d)) + 0.3)
    _write_acts_run(out, "modeshift", shifted)
    _write_acts_run(out, "modeok", a + 0.001 * rs.normal(size=(n, d)))
    qg.report("testgeo", out)
    with open(os.path.join(out, "report.json")) as f:
        rep = json.load(f)
    assert rep["kid_floor"] is not None
    assert rep["channels"]["image"]["armed"] is True
    shift = rep["modes"]["modeshift"]
    # the FD channel is blind here (shift below ~2x its bias floor)...
    assert shift["fd_ratio"] < 2.0
    # ...but the unbiased KID channel flags it decisively
    assert shift["kid_ratio"] > 5.0
    assert shift["verdict"] == "FAIL"
    ok = rep["modes"]["modeok"]
    assert ok["kid_ratio"] <= 2.0 and ok["verdict"] == "PASS"


def test_report_kid_falls_back_without_acts(qg, tmp_path):
    """A mix of acts-bearing and legacy stats-only runs degrades to the FD
    channel (the KID floor needs every run's activations)."""
    d, n = 32, 64
    rs = np.random.RandomState(1)
    out = str(tmp_path)
    _write_acts_run(out, "exactA", rs.normal(size=(n, d)))
    _write_run(out, "exactB", np.zeros(d), np.eye(d))
    _write_run(out, "modex", np.zeros(d), np.eye(d))
    qg.report("testgeo", out)
    with open(os.path.join(out, "report.json")) as f:
        rep = json.load(f)
    assert rep["kid_floor"] is None
    assert "kid" not in rep["modes"]["modex"]
    # no dose evidence at all -> unarmed report, UNARMED verdict
    assert rep["report_armed"] is False
    assert rep["modes"]["modex"]["verdict"] == "UNARMED"


def test_latent_stats_identifies_patterns(qg):
    """The latent pattern-match channel must assign pattern-built latents to
    the right class with high match quality, and score unrelated noise low —
    this is the property that let it catch the broken trained_L instance
    (q<0.06 everywhere) that the FD/KID channels rubber-stamped."""
    pats = qg._class_patterns()
    rs = np.random.RandomState(3)
    y = rs.randint(0, 10, 64)
    z = pats[y] + 0.05 * rs.normal(size=(64, 32, 32, 4))
    class_hist, q_hist = qg._latent_stats(z, pats)
    np.testing.assert_array_equal(class_hist, np.bincount(y, minlength=10))
    # match quality concentrated high: all mass above q = 0.5
    assert q_hist[: qg.Q_BINS // 2].sum() == 0
    assert q_hist.sum() == 64
    # pure noise: same bin count, but mass at LOW q (off-manifold signal)
    noise = rs.normal(size=(64, 32, 32, 4))
    _, q_noise = qg._latent_stats(noise, pats)
    assert q_noise[qg.Q_BINS // 2:].sum() == 0


def _write_latent_run(out_dir, spec, class_hist, q_hist, d=4, n=256):
    np.savez(
        os.path.join(out_dir, f"{spec.replace(':', '_').replace(',', '-')}.npz"),
        mu=np.zeros(d), sigma=np.eye(d), mask_hist=np.zeros(256, np.int64),
        n=n, wall=1.0, spec=spec,
        latent_class_hist=np.asarray(class_hist, np.int64),
        latent_q_hist=np.asarray(q_hist, np.int64),
    )


def test_report_latent_tv_control_normalized(qg, tmp_path):
    """Latent-channel verdicts are keyed to the 25-NFE control's own shift
    (the stable cross-instance statistic), not the raw seed floor: a mode at
    1.5x the control PASSes, a mode far beyond it FAILs even when the image
    FD channel sees nothing."""
    out = str(tmp_path)
    qh = np.zeros(qg.Q_BINS, np.int64)
    qh[28] = 1000

    def q_shifted(k):  # move k samples one bin down — TV = k/1000
        h = qh.copy()
        h[28] -= k
        h[27] += k
        return h

    cls = np.full(10, 100, np.int64)
    _write_latent_run(out, "exactA", cls, qh)
    _write_latent_run(out, "exactB", cls, q_shifted(4))    # floor = 0.004
    _write_latent_run(out, "steps=25", cls, q_shifted(10))  # ctrl = 0.010
    bad_q = np.zeros(qg.Q_BINS, np.int64)
    bad_q[2] = 1000                                         # TV 1.0 = 100x
    _write_latent_run(out, "steps=10", cls, bad_q)          # arms the channel
    _write_latent_run(out, "modegood", cls, q_shifted(15))  # 1.5x ctrl
    _write_latent_run(out, "modebad", cls, bad_q)
    qg.report("testgeo", out)
    with open(os.path.join(out, "report.json")) as f:
        rep = json.load(f)
    assert rep["latent_tv_floor"] == pytest.approx(0.004)
    assert rep["latent_tv_control_25nfe"] == pytest.approx(0.010)
    assert rep["channels"]["latent"]["armed"] is True
    good = rep["modes"]["modegood"]
    assert good["latent_tv_ctrl_ratio"] == pytest.approx(1.5)
    assert good["verdict"] == "PASS"
    bad = rep["modes"]["modebad"]
    assert bad["latent_tv_ctrl_ratio"] == pytest.approx(100.0)
    assert bad["verdict"] == "FAIL"
    # the control itself is judged on the floor ladder, not against itself
    assert "latent_tv_ctrl_ratio" not in rep["modes"]["steps=25"]


def test_report_latent_channel_absent_backcompat(qg, tmp_path):
    """Legacy npz runs without latent histograms must not break the report
    (the channel degrades to None, image/mask channels still verdict)."""
    out = str(tmp_path)
    _write_run(out, "exactA", np.zeros(4), np.eye(4))
    _write_run(out, "exactB", np.zeros(4), np.eye(4))
    _write_run(out, "modex", np.zeros(4), np.eye(4))
    qg.report("testgeo", out)
    with open(os.path.join(out, "report.json")) as f:
        rep = json.load(f)
    assert rep["latent_tv_floor"] is None
    assert rep["modes"]["modex"]["latent_tv"] is None


def test_report_degenerate_zero_control(qg, tmp_path, capsys):
    """A 25-NFE control whose TV vs exactA is exactly 0.0 is a degenerate
    yardstick (ADVICE round 4): the report must warn and fall back to the
    floor ladder instead of silently reverting via truthiness."""
    d = 4
    sigma = np.eye(d)
    out = str(tmp_path)
    base = np.zeros(256, np.int64)
    base[:4] = [700, 100, 100, 100]
    jitter = base.copy()
    jitter[:4] = [690, 110, 100, 100]  # TV floor = 0.01
    shifted = base.copy()
    shifted[:4] = [100, 700, 100, 100]  # TV = 0.6
    _write_run(out, "exactA", np.zeros(d), sigma, mask_hist=base)
    _write_run(out, "exactB", np.zeros(d), sigma, mask_hist=jitter)
    _write_run(out, "steps=25", np.zeros(d), sigma, mask_hist=base)  # ctrl=0.0
    _write_run(out, "steps=10", np.zeros(d), sigma, mask_hist=shifted)
    _write_run(out, "modeshift", np.zeros(d), sigma, mask_hist=shifted)
    qg.report("testgeo", out)
    assert "degenerate" in capsys.readouterr().out
    with open(os.path.join(out, "report.json")) as f:
        rep = json.load(f)
    assert rep["tv_control_25nfe"] == 0.0
    mode = rep["modes"]["modeshift"]
    # floor-ladder fallback: 60x the floor -> FAIL, no ctrl ratio recorded
    assert "mask_tv_ctrl_ratio" not in mode
    assert mode["mask_tv_floor_ratio"] == pytest.approx(60.0)
    assert mode["verdict"] == "FAIL"


def test_panoptic_class_assets_coupled(qg):
    """The trained_panoptic distribution must couple image and mask: the
    mask ids are a quantization of the class pattern's first channel, ids
    are class-disjoint, and everything is deterministic."""
    pats, masks, ctxs = qg._panoptic_class_assets()
    pats2, masks2, ctxs2 = qg._panoptic_class_assets()
    np.testing.assert_array_equal(masks, masks2)
    np.testing.assert_allclose(pats, pats2)
    np.testing.assert_allclose(ctxs, ctxs2)
    assert pats.shape == (10, 32, 32, 4)
    assert masks.shape == (10, 64, 64)
    assert ctxs.shape == (10, 77, 768)
    for c in range(10):
        ids = set(np.unique(masks[c])) - {0}
        assert ids <= {1 + 2 * c, 2 + 2 * c}  # class-disjoint region ids
        up = np.repeat(np.repeat(pats[c, ..., 0], 2, 0), 2, 1)
        np.testing.assert_array_equal(masks[c] == 1 + 2 * c, up >= 0.3)
        np.testing.assert_array_equal(masks[c] == 2 + 2 * c, up <= -0.3)


def test_panoptic_class_assets_512_geometry(qg):
    """trained_panoptic_512 assets: 64x64 latent patterns / 128 mask grid,
    same coupling, and the 64-grid patterns are the SAME continuous
    per-class functions sampled finer — every other sample equals the
    32-grid pattern exactly (endpoint=False linspace nesting)."""
    assert qg._panoptic_geo_dims("trained_panoptic_512") == (64, 128)
    assert qg._panoptic_geo_dims("trained_panoptic") == (32, 64)
    pats64, masks, ctxs = qg._panoptic_class_assets(mask=128, size=64)
    assert pats64.shape == (10, 64, 64, 4)
    assert masks.shape == (10, 128, 128)
    pats32, _, ctxs32 = qg._panoptic_class_assets()
    np.testing.assert_allclose(pats64[:, ::2, ::2, :], pats32, atol=1e-12)
    np.testing.assert_allclose(ctxs, ctxs32)  # contexts size-independent
    for c in range(10):
        up = np.repeat(np.repeat(pats64[c, ..., 0], 2, 0), 2, 1)
        np.testing.assert_array_equal(masks[c] == 1 + 2 * c, up >= 0.3)


def test_structured_batch_deterministic(qg):
    a = qg._structured_batch(np.random.RandomState(7), 16)
    b = qg._structured_batch(np.random.RandomState(7), 16)
    np.testing.assert_allclose(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    assert a[0].shape == (16, 32, 32, 4) and a[1].shape == (16,)
