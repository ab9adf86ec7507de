"""KID (unbiased polynomial-kernel MMD^2) — `evaluation/kid.py`.

The property under test is the one the quality gate relies on: the estimator
is ~0 (within its own error bar) for identical distributions even when the
feature dimension exceeds the sample count (where the Frechet distance's
seed-to-seed floor is pure estimator bias), and it moves decisively for a
real distribution shift of the same magnitude.
"""
import numpy as np
import pytest

from panopticdiffusionmodels_tpu.evaluation.fid import (
    compute_statistics,
    frechet_distance,
)
from panopticdiffusionmodels_tpu.evaluation.kid import (
    kid,
    mmd2_unbiased,
    polynomial_kernel,
)


def test_polynomial_kernel_matches_definition():
    rs = np.random.RandomState(0)
    x = rs.normal(size=(5, 16))
    y = rs.normal(size=(7, 16))
    k = polynomial_kernel(x, y)
    expect = (x[2] @ y[3] / 16 + 1.0) ** 3
    assert np.allclose(k[2, 3], expect)
    assert k.shape == (5, 7)


def test_mmd2_zero_in_expectation_for_same_distribution():
    rs = np.random.RandomState(1)
    vals = []
    for _ in range(20):
        x = rs.normal(size=(64, 8))
        y = rs.normal(size=(64, 8))
        vals.append(
            mmd2_unbiased(
                polynomial_kernel(x, x),
                polynomial_kernel(y, y),
                polynomial_kernel(x, y),
            )
        )
    vals = np.asarray(vals)
    # unbiased: the mean over draws is ~0 relative to the draw spread
    assert abs(vals.mean()) < 2.0 * vals.std() / np.sqrt(len(vals)) + 1e-3


def test_kid_null_vs_shift_power_at_d_gt_n():
    """d > N: the regime where the FD floor drowns real shifts (the round-3
    gate measured a 10-NFE control BELOW the N=1024 FD floor).  KID must keep
    its null near 0 and flag a modest mean shift."""
    d, n = 256, 128
    rs = np.random.RandomState(2)
    a = rs.normal(size=(n, d))
    b = rs.normal(size=(n, d))          # same distribution
    c = rs.normal(size=(n, d)) + 0.25   # shifted
    null_mean, null_std = kid(a, b, subset_size=64, n_subsets=50)
    shift_mean, shift_std = kid(a, c, subset_size=64, n_subsets=50)
    null_scale = abs(null_mean) + 2.0 * null_std
    assert shift_mean > 5.0 * null_scale
    # ... while the FD "floor" between the two SAME-distribution draws is
    # itself enormous at d > N (this is the failure mode KID replaces)
    fd_null = frechet_distance(*compute_statistics(a), *compute_statistics(b))
    fd_shift = frechet_distance(*compute_statistics(a), *compute_statistics(c))
    assert fd_shift < 2.0 * fd_null  # FD cannot separate them at this N


def test_exclude_matched_restores_unbiasedness_for_paired_sets():
    """Seed-paired runs: y_i correlated with x_i.  The plain estimator is
    deflated (can go negative); excluding the matched diagonal restores ~0."""
    rs = np.random.RandomState(3)
    x = rs.normal(size=(128, 32))
    y = x + 0.01 * rs.normal(size=(128, 32))  # near-duplicates, index-aligned
    plain, _ = kid(x, y, subset_size=64, n_subsets=30, exclude_matched=False)
    fixed, fixed_std = kid(x, y, subset_size=64, n_subsets=30, exclude_matched=True)
    assert plain < -1e-4  # visibly deflated by the paired diagonal
    assert abs(fixed) < abs(plain) / 10
    assert abs(fixed) <= 3 * fixed_std + 1e-4  # consistent with 0


def test_exclude_matched_noop_for_independent_sets():
    rs = np.random.RandomState(4)
    a = rs.normal(size=(128, 16))
    b = rs.normal(size=(128, 16)) + 0.3
    m1, _ = kid(a, b, subset_size=64, n_subsets=40, exclude_matched=False)
    m2, _ = kid(a, b, subset_size=64, n_subsets=40, exclude_matched=True)
    assert np.isclose(m1, m2, rtol=0.2, atol=1e-3)


def test_kid_validation_errors():
    a = np.zeros((4, 8))
    with pytest.raises(ValueError):
        kid(a, np.zeros((5, 8)), exclude_matched=True)
    with pytest.raises(ValueError):
        kid(a, a, subset_size=1)
    with pytest.raises(ValueError):
        mmd2_unbiased(
            np.eye(3), np.eye(4), np.zeros((3, 4)), exclude_matched=True
        )
