import os

import numpy as np
import pytest

from panopticdiffusionmodels_tpu.evaluation import (
    color_map,
    compute_statistics,
    eval_mask_cnt,
    fid_from_stats,
    frechet_distance,
    get_colormap,
)
from panopticdiffusionmodels_tpu.evaluation.fid import load_stats, save_stats
from panopticdiffusionmodels_tpu.evaluation.sampler_io import sample2dir


def test_frechet_identical_is_zero():
    rng = np.random.default_rng(0)
    acts = rng.normal(size=(500, 16))
    mu, sigma = compute_statistics(acts)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_mean_shift():
    # same covariance, shifted mean: FID = |delta|^2
    d = 8
    mu1 = np.zeros(d)
    mu2 = np.full(d, 0.5)
    sigma = np.eye(d)
    fid = frechet_distance(mu1, sigma, mu2, sigma)
    np.testing.assert_allclose(fid, d * 0.25, rtol=1e-6)


def test_frechet_variance_difference():
    # zero means, isotropic: FID = sum (sqrt(s1) - sqrt(s2))^2
    d = 4
    s1, s2 = 4.0, 1.0
    fid = frechet_distance(np.zeros(d), s1 * np.eye(d), np.zeros(d), s2 * np.eye(d))
    np.testing.assert_allclose(fid, d * (2.0 - 1.0) ** 2, rtol=1e-6)


def test_stats_file_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    acts = rng.normal(size=(200, 8))
    mu, sigma = compute_statistics(acts)
    path = str(tmp_path / "stats.npz")
    save_stats(path, mu, sigma)
    mu2, sigma2 = load_stats(path)
    np.testing.assert_array_equal(mu, mu2)
    assert fid_from_stats(path, (mu, sigma)) < 1e-6


def test_eval_mask_cnt():
    gt = np.zeros((2, 8, 8), dtype=np.int32)
    pred = gt.copy()
    assert eval_mask_cnt(pred, gt) == 0.0
    pred2 = pred.copy()
    pred2[0, 0, 0] = 5  # one pixel differs -> 2 count diffs (one +, one -)
    assert eval_mask_cnt(pred2, gt) == pytest.approx(2 / 64 / 2)


def test_color_map(tmp_path):
    cm = get_colormap(str(tmp_path / "cm.npy"))
    assert cm.shape == (256, 3)
    ids = np.array([[[0, 200], [13, 255]]])
    rgb = color_map(ids, cm)
    assert rgb.shape == (1, 2, 2, 3)
    np.testing.assert_array_equal(rgb[0, 0, 0], cm[0])


def test_inception_architecture_shapes(rng):
    from panopticdiffusionmodels_tpu.evaluation.inception import (
        inception_pool3,
        random_params,
    )

    params = random_params()
    x = np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    feats = inception_pool3(params, x)
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()


def test_sample2dir_contract(tmp_path):
    sample_dir = str(tmp_path / "samples")
    mask_dir = str(tmp_path / "mask")
    rng = np.random.default_rng(0)

    counter = {"n": 0}

    def sample_fn(n):
        idx = np.arange(counter["n"], counter["n"] + n)
        counter["n"] += n
        samples = rng.uniform(-1, 1, (n, 16, 16, 3)).astype(np.float32)
        pred_mask = rng.normal(size=(n, 8, 8, 8)).astype(np.float32)
        panoptic = rng.integers(0, 201, (n, 8, 8, 1))
        return idx, samples, pred_mask, 0.5, panoptic

    metrics = sample2dir(
        sample_dir, 8, 4, sample_fn,
        unpreprocess_fn=lambda v: np.clip((v + 1) / 2, 0, 1),
        use_panoptic=True, mask_path=mask_dir,
    )
    pngs = sorted(os.listdir(sample_dir))
    assert len(pngs) == 8
    assert len(os.listdir(mask_dir)) == 8
    assert "eval_loss_mask" in metrics and metrics["eval_loss_mask"] == 0.5
    assert "eval_cnt_mask_diff" in metrics


def test_sample2dir_overlap_equivalent(tmp_path):
    """The one-deep dispatch/write pipeline (overlap=True, the default) must
    produce byte-identical files and metrics vs the sequential loop."""

    def make_sample_fn():
        rng = np.random.default_rng(7)
        counter = {"n": 0}

        def sample_fn(n):
            idx = np.arange(counter["n"], counter["n"] + n)
            counter["n"] += n
            samples = rng.uniform(-1, 1, (n, 16, 16, 3)).astype(np.float32)
            pred_mask = rng.normal(size=(n, 8, 8, 8)).astype(np.float32)
            panoptic = rng.integers(0, 201, (n, 8, 8, 1))
            return idx, samples, pred_mask, np.float32(idx[0]), panoptic

        return sample_fn

    outs = {}
    for overlap in (False, True):
        d = tmp_path / f"ov{int(overlap)}"
        metrics = sample2dir(
            str(d / "samples"), 10, 4, make_sample_fn(),
            unpreprocess_fn=lambda v: np.clip((v + 1) / 2, 0, 1),
            use_panoptic=True, mask_path=str(d / "mask"), overlap=overlap,
        )
        files = {
            f"{sub}/{name}": (d / sub / name).read_bytes()
            for sub in ("samples", "mask")
            for name in sorted(os.listdir(d / sub))
        }
        outs[overlap] = (metrics, files)
    assert outs[False][0] == outs[True][0]
    assert sorted(outs[False][1]) == sorted(outs[True][1])
    assert all(outs[False][1][k] == outs[True][1][k] for k in outs[False][1])


def test_dir_statistics_threaded_equivalent(tmp_path):
    """Threaded decode + one-deep device overlap (workers>0, the default)
    must produce the same statistics as the sequential path."""
    from PIL import Image

    from panopticdiffusionmodels_tpu.evaluation.fid import dir_statistics

    rng = np.random.default_rng(3)
    for i in range(11):
        arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"{i}.png")

    calls = []

    def extractor(batch01):
        calls.append(batch01.shape[0])
        return batch01.reshape(batch01.shape[0], -1)[:, :32]

    mu0, s0 = dir_statistics(str(tmp_path), extractor, batch_size=4, workers=0)
    mu1, s1 = dir_statistics(str(tmp_path), extractor, batch_size=4, workers=4)
    assert calls == [4, 4, 3, 4, 4, 3]
    np.testing.assert_array_equal(mu0, mu1)
    np.testing.assert_array_equal(s0, s1)


def test_frechet_distance_singular_covariance_no_nan():
    """Rank-deficient covariances must trigger the eps-offset retry
    (reference tools/fid_score.py:60-67) and return a finite distance."""
    from panopticdiffusionmodels_tpu.evaluation.fid import frechet_distance

    rng = np.random.default_rng(0)
    a = rng.normal(size=(8, 16))  # 8 samples in 16-d -> singular covariance
    b = rng.normal(size=(8, 16)) + 1.0
    mu1, s1 = a.mean(0), np.cov(a, rowvar=False)
    mu2, s2 = b.mean(0), np.cov(b, rowvar=False)
    d = frechet_distance(mu1, s1, mu2, s2)
    assert np.isfinite(d) and d > 0
    assert frechet_distance(mu1, s1, mu1, s1) < 1e-6
