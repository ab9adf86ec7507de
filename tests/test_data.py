import os
import pickle

import numpy as np
import pytest

from panopticdiffusionmodels_tpu.data import Loader, get_dataset, prefetch_to_device
from panopticdiffusionmodels_tpu.data.datasets import (
    CFGDataset,
    MSCOCOFeatureDataset,
    SyntheticDataset,
    UnlabeledDataset,
    min_pool_2d,
)


def _write_fake_cifar(tmp_path):
    root = tmp_path / "cifar-10-batches-py"
    root.mkdir()
    rng = np.random.default_rng(0)
    for i in range(1, 6):
        data = {
            b"data": rng.integers(0, 256, (10000, 3072), dtype=np.int64).astype(np.uint8),
            b"labels": rng.integers(0, 10, 10000).tolist(),
        }
        with open(root / f"data_batch_{i}", "wb") as f:
            pickle.dump(data, f)
    data = {
        b"data": rng.integers(0, 256, (1000, 3072), dtype=np.int64).astype(np.uint8),
        b"labels": rng.integers(0, 10, 1000).tolist(),
    }
    with open(root / "test_batch", "wb") as f:
        pickle.dump(data, f)
    return str(tmp_path)


def test_cifar10_factory(tmp_path):
    path = _write_fake_cifar(tmp_path)
    ds = get_dataset("cifar10", path=path, random_flip=True)
    assert len(ds.train) == 50000
    img, label = ds.train[0]
    assert img.shape == (32, 32, 3)
    assert -1.0 <= img.min() and img.max() <= 1.0
    assert 0 <= label < 10
    # unlabeled view
    unl = ds.get_split("train", labeled=False)
    assert isinstance(unl, UnlabeledDataset)
    assert unl[0].shape == (32, 32, 3)
    # unpreprocess maps back to [0, 1]
    up = ds.unpreprocess(img)
    assert 0.0 <= up.min() and up.max() <= 1.0


def test_min_pool():
    x = np.arange(16).reshape(4, 4)
    pooled = min_pool_2d(x, 2)
    np.testing.assert_array_equal(pooled, [[0, 2], [8, 10]])


def test_mscoco_feature_dataset(tmp_path):
    d = tmp_path / "feat"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        np.save(d / f"{i}.npy", rng.normal(size=(8, 32, 32)).astype(np.float32))
        for k in range(5):
            np.save(d / f"{i}_{k}.npy", rng.normal(size=(77, 16)).astype(np.float32))
        np.save(d / f"{i}_seg.npy", rng.integers(0, 201, (256, 256)).astype(np.int32))
    ds = MSCOCOFeatureDataset(str(d), mask_size=64)
    assert len(ds) == 4
    z, ctx, seg = ds[0]
    assert z.shape == (32, 32, 8)  # HWC moments
    assert ctx.shape == (77, 16)
    assert seg.shape == (64, 64, 1)
    assert seg.dtype == np.int32


def test_cfg_dataset_dropout():
    base = SyntheticDataset([(4,), (3,)], n=64, seed=0)
    empty = np.full((3,), 7.0, dtype=np.float32)
    cfg = CFGDataset(base, p_uncond=1.0, empty_token=empty)
    x, y = cfg[0]
    np.testing.assert_array_equal(y, empty)
    cfg0 = CFGDataset(base, p_uncond=0.0, empty_token=empty)
    x, y = cfg0[0]
    assert not np.allclose(y, empty)


def test_loader_batches():
    ds = SyntheticDataset([(4, 4, 3)], n=32, seed=0)
    loader = Loader(ds, batch_size=8, num_workers=2, seed=0)
    batches = list(loader.epoch())
    assert len(batches) == 4
    assert batches[0].shape == (8, 4, 4, 3)


def test_loader_tuple_collate_and_prefetch():
    import jax

    ds = SyntheticDataset([(4,), (2,)], n=16, seed=0)
    loader = Loader(ds, batch_size=4, num_workers=0)
    it = iter(loader)
    sharding = jax.sharding.SingleDeviceSharding(jax.devices("cpu")[0])
    stream = prefetch_to_device(it, sharding, size=2)
    batch = next(stream)
    assert batch[0].shape == (4, 4) and batch[1].shape == (4, 2)
    assert isinstance(batch[0], jax.Array)
    next(stream)  # pulls again without deadlock


def test_prefetch_cast_int_narrows_and_guards():
    import jax
    import pytest

    ds = SyntheticDataset([(4,), (3, 3, 1)], n=16, seed=0, int_fields=(1,))
    loader = Loader(ds, batch_size=4, num_workers=0, shuffle=False)
    sharding = jax.sharding.SingleDeviceSharding(jax.devices("cpu")[0])
    stream = prefetch_to_device(iter(loader), sharding, cast_int=np.uint8)
    batch = next(stream)
    assert batch[0].dtype == np.float32  # float fields untouched
    assert batch[1].dtype == np.uint8
    # bit-exact vs the int32 source rows (ids 0..200 fit uint8)
    np.testing.assert_array_equal(
        np.asarray(batch[1]).astype(np.int32), ds.fields[1][:4]
    )

    # out-of-range ids raise instead of wrapping
    big = SyntheticDataset([(3, 3, 1)], n=8, seed=0, int_fields=(0,))
    big.fields[0][0, 0, 0, 0] = 300
    loader2 = Loader(big, batch_size=8, num_workers=0, shuffle=False)
    stream2 = prefetch_to_device(iter(loader2), sharding, cast_int=np.uint8)
    with pytest.raises(ValueError, match="exceeds"):
        next(stream2)


def test_loader_skip_matches_uninterrupted_stream():
    """skip(k) then iterate == batches k.. of a fresh loader: deterministic
    data resume, crossing an epoch boundary (n=32, bs=8 -> 4 batches/epoch)."""
    ds = SyntheticDataset([(4,)], n=32, seed=0)
    full = Loader(ds, batch_size=8, num_workers=0, seed=7)
    it = iter(full)
    want = [next(it) for _ in range(9)]

    for k in (1, 3, 4, 6):  # mid-epoch, boundary-1, exact boundary, epoch 2
        resumed = Loader(ds, batch_size=8, num_workers=0, seed=7)
        resumed.skip(k)
        rit = iter(resumed)
        for j in range(k, 9):
            np.testing.assert_array_equal(next(rit), want[j])

    # dataset < global batch is refused at construction (and skip() has a
    # belt-and-braces ValueError should an empty epoch ever arise).
    with pytest.raises(AssertionError, match="smaller than one batch"):
        Loader(SyntheticDataset([(4,)], n=4, seed=0), batch_size=8,
               num_workers=0, drop_last=True)


def test_synthetic_factory():
    ds = get_dataset("synthetic", n=16, z_shape=(8, 8, 8), clip_shape=(7, 16), mask_size=16)
    z, ctx, pan = ds.train[0]
    assert z.shape == (8, 8, 8)
    assert pan.dtype == np.int32
    assert 0 <= pan.min() and pan.max() <= 200


def test_imagenet_raw_factory(tmp_path):
    from PIL import Image

    root = tmp_path / "imagenet" / "train"
    for ci, cname in enumerate(["n01", "n02"]):
        d = root / cname
        d.mkdir(parents=True)
        for j in range(3):
            Image.new("RGB", (80, 70), (ci * 100, j * 40, 10)).save(d / f"{j}.JPEG")
    ds = get_dataset("imagenet", path=str(tmp_path / "imagenet"), resolution=64)
    assert len(ds.train) == 6
    img, label = ds.train[0]
    assert img.shape == (64, 64, 3)
    assert label in (0, 1)
    assert ds.data_shape == (64, 64, 3)
    assert "imagenet64" in ds.fid_stat


def test_seg_resize_preserves_ids():
    """Label maps must be resized NEAREST: bicubic blends the RGB-encoded
    segment ids into colors that decode to nonexistent segments."""
    from PIL import Image

    from panopticdiffusionmodels_tpu.data.mscoco import center_crop_resize, rgb2id

    rng = np.random.default_rng(0)
    ids = rng.choice([7, 100000, 3050000], size=(100, 100))
    rgb = np.stack([ids % 256, (ids // 256) % 256, ids // 256 // 256],
                   axis=-1).astype(np.uint8)
    png = Image.fromarray(rgb)
    out = rgb2id(np.asarray(center_crop_resize(png, 64, nearest=True),
                            dtype=np.uint8))
    assert set(np.unique(out)) <= {7, 100000, 3050000}, np.unique(out)
