"""Dataset factories: CIFAR-10, CelebA, ImageNet (raw + pre-encoded features),
MS-COCO pre-encoded features with panoptic maps, and a synthetic dataset.

Host-side re-design of the reference `datasets.py` for a TPU input pipeline:

  * everything is numpy + PIL (no torch/torchvision dependency on the hot path);
    CIFAR-10 is parsed straight from the python-pickle batches,
  * datasets expose `__len__`/`__getitem__` over numpy arrays in NHWC layout;
    batching/prefetch/sharding live in `loader.py`,
  * the pre-encoded feature datasets read the SAME `.npy` file contracts the
    reference extraction scripts produce (`{i}.npy` latent moments,
    `{i}_{k}.npy` CLIP contexts, `{i}_seg.npy` seg maps — reference
    `datasets.py:564-613`), so features extracted with either framework are
    interchangeable.  Stored arrays are channel-first (torch layout); readers
    transpose to NHWC once on the host.
"""
from __future__ import annotations

import os
import pickle
import random
from typing import Optional, Sequence, Tuple

import numpy as np


class DatasetFactory:
    """Base factory (reference `datasets.py:84-130`): train/test splits,
    preprocessing contract, FID stat path."""

    def __init__(self):
        self.train = None
        self.test = None

    def get_split(self, split: str, labeled: bool = False):
        if split == "train":
            dataset = self.train
        elif split == "test":
            dataset = self.test
        else:
            raise ValueError(split)
        if self.has_label and not labeled:
            return UnlabeledDataset(dataset)
        return dataset

    def unpreprocess(self, v):
        """[-1, 1] -> [0, 1] image space (reference `datasets.py:118-121`)."""
        v = 0.5 * (v + 1.0)
        return np.clip(v, 0.0, 1.0)

    @property
    def has_label(self) -> bool:
        return True

    @property
    def data_shape(self):
        raise NotImplementedError

    @property
    def fid_stat(self) -> Optional[str]:
        return None


class UnlabeledDataset:
    """Strip labels: return only the first element (reference `datasets.py:19-28`)."""

    def __init__(self, dataset):
        self.dataset = dataset

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, item):
        data = self.dataset[item]
        if isinstance(data, tuple):
            return data[0]
        return data


class LabeledDataset:
    """Attach a constant label (reference `datasets.py:31-42`)."""

    def __init__(self, dataset, label: int):
        self.dataset = dataset
        self.label = label

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, item):
        return self.dataset[item], self.label


class CFGDataset:
    """Drop context w.p. p_uncond for classifier-free guidance training
    (reference `datasets.py:45-81`)."""

    def __init__(self, dataset, p_uncond: float, empty_token):
        self.dataset = dataset
        self.p_uncond = p_uncond
        self.empty_token = empty_token

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, item):
        data = self.dataset[item]
        x, y = data[0], data[1]
        rest = data[2:]
        if random.random() < self.p_uncond:
            y = self.empty_token
        return (x, y, *rest)


# --------------------------------------------------------------------------
# CIFAR-10 (raw python-pickle batches; replaces torchvision.datasets.CIFAR10)
# --------------------------------------------------------------------------


def _load_cifar10_arrays(path: str, train: bool) -> Tuple[np.ndarray, np.ndarray]:
    batch_dir = os.path.join(path, "cifar-10-batches-py")
    root = batch_dir if os.path.isdir(batch_dir) else path
    names = [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
    xs, ys = [], []
    for name in names:
        with open(os.path.join(root, name), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        xs.append(np.asarray(d[b"data"], dtype=np.uint8))
        ys.append(np.asarray(d[b"labels"], dtype=np.int32))
    x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)  # NHWC
    y = np.concatenate(ys)
    return x, y


class ArrayImageDataset:
    """In-memory image dataset: uint8 NHWC -> float [-1, 1], optional random flip."""

    def __init__(self, images: np.ndarray, labels: Optional[np.ndarray] = None,
                 random_flip: bool = False):
        self.images = images
        self.labels = labels
        self.random_flip = random_flip

    def __len__(self):
        return len(self.images)

    def __getitem__(self, item):
        img = self.images[item].astype(np.float32) / 127.5 - 1.0
        if self.random_flip and random.random() < 0.5:
            img = img[:, ::-1, :].copy()
        if self.labels is None:
            return img
        return img, int(self.labels[item])


class CIFAR10(DatasetFactory):
    """reference `datasets.py:135-181`."""

    def __init__(self, path: str, random_flip: bool = False, cfg: bool = False,
                 p_uncond: Optional[float] = None):
        super().__init__()
        x_train, y_train = _load_cifar10_arrays(path, train=True)
        x_test, y_test = _load_cifar10_arrays(path, train=False)
        train = ArrayImageDataset(x_train, y_train, random_flip=random_flip)
        if cfg:  # label-null dropout (null class = 10), same as ImageNet
            assert p_uncond is not None
            train = CFGLabelDataset(train, p_uncond, 10)
        self.train = train
        self.test = ArrayImageDataset(x_test, y_test)
        assert len(self.train) == 50000

    @property
    def data_shape(self):
        return (32, 32, 3)

    @property
    def fid_stat(self):
        return "assets/fid_stats/fid_stats_cifar10_train_pytorch.npz"

    @property
    def has_label(self):
        return True


# --------------------------------------------------------------------------
# Image-folder datasets (CelebA / raw ImageNet)
# --------------------------------------------------------------------------


class FolderImageDataset:
    """Center-crop + resize images from a directory tree (reference
    `ImageDataset`, `datasets.py:304-384`, simplified to the used paths)."""

    def __init__(self, paths: Sequence[str], resolution: int, labels=None,
                 random_flip: bool = True):
        self.paths = list(paths)
        self.resolution = resolution
        self.labels = labels
        self.random_flip = random_flip

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, item):
        from PIL import Image

        img = Image.open(self.paths[item]).convert("RGB")
        # center crop to square, then resize
        w, h = img.size
        s = min(w, h)
        img = img.crop(((w - s) // 2, (h - s) // 2, (w + s) // 2, (h + s) // 2))
        img = img.resize((self.resolution, self.resolution), Image.BICUBIC)
        arr = np.asarray(img, dtype=np.float32) / 127.5 - 1.0
        if self.random_flip and random.random() < 0.5:
            arr = arr[:, ::-1, :].copy()
        if self.labels is None:
            return arr
        return arr, int(self.labels[item])


class CelebA(DatasetFactory):
    """reference `datasets.py:406-441` (64x64, train split, random flip)."""

    def __init__(self, path: str, resolution: int = 64):
        super().__init__()
        img_dir = os.path.join(path, "img_align_celeba")
        root = img_dir if os.path.isdir(img_dir) else path
        paths = sorted(
            os.path.join(root, p)
            for p in os.listdir(root)
            if p.lower().endswith((".jpg", ".png", ".jpeg"))
        )
        self.resolution = resolution
        self.train = FolderImageDataset(paths, resolution, random_flip=True)
        self.test = FolderImageDataset(paths[:512], resolution, random_flip=False)

    @property
    def has_label(self):
        return False

    @property
    def data_shape(self):
        return (self.resolution, self.resolution, 3)

    @property
    def fid_stat(self):
        return "assets/fid_stats/fid_stats_celeba64_train_50000_ddim.npz"


class ImageNetRaw(DatasetFactory):
    """Raw class-labeled ImageNet from a train/<class>/*.JPEG tree
    (reference `datasets.py:253-301`), center-cropped to `resolution`."""

    def __init__(self, path: str, resolution: int = 64, random_flip: bool = True,
                 cfg: bool = False, p_uncond: Optional[float] = None):
        super().__init__()
        self.resolution = resolution
        train_root = os.path.join(path, "train")
        root = train_root if os.path.isdir(train_root) else path
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        paths, labels = [], []
        for cname in classes:
            cdir = os.path.join(root, cname)
            for n in sorted(os.listdir(cdir)):
                if n.lower().endswith((".jpeg", ".jpg", ".png")):
                    paths.append(os.path.join(cdir, n))
                    labels.append(self.class_to_idx[cname])
        train = FolderImageDataset(paths, resolution, labels=labels,
                                   random_flip=random_flip)
        if cfg:
            assert p_uncond is not None
            train = CFGLabelDataset(train, p_uncond, len(classes))
        self.train = train
        self.test = FolderImageDataset(paths[:512], resolution,
                                       labels=labels[:512], random_flip=False)

    @property
    def data_shape(self):
        return (self.resolution, self.resolution, 3)

    @property
    def fid_stat(self):
        return (
            f"assets/fid_stats/fid_stats_imagenet{self.resolution}_guided_diffusion.npz"
        )


# --------------------------------------------------------------------------
# Pre-encoded feature datasets
# --------------------------------------------------------------------------


class FeatureDataset:
    """ImageNet latent-moment features: each `{i}.npy` pickles a (moments, label)
    pair, flip-augmented to 2x the raw image count (reference
    `datasets.py:187-198`).  Stored moments are CHW; returned HWC."""

    def __init__(self, path: str, n: Optional[int] = None):
        self.path = path
        if n is None:
            n = len([name for name in os.listdir(path) if name.endswith(".npy")])
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        z, label = np.load(
            os.path.join(self.path, f"{idx}.npy"), allow_pickle=True
        )
        z = np.asarray(z, dtype=np.float32)
        return np.ascontiguousarray(z.transpose(1, 2, 0)), int(label)


class ImageNetFeatures(DatasetFactory):
    """imagenet256_features / imagenet512_features (reference `datasets.py:187-250`).

    Class-conditional CFG uses label K (=1000) as the null class
    (reference `eval.py:43-46`, configs num_classes=1001)."""

    def __init__(self, path: str, cfg: bool = False, p_uncond: Optional[float] = None,
                 resolution: int = 256):
        super().__init__()
        self.resolution = resolution
        train = FeatureDataset(path)
        self.K = 1000
        if cfg:
            assert p_uncond is not None
            self.train = CFGLabelDataset(train, p_uncond, self.K)
        else:
            self.train = train
        self.test = train

    @property
    def data_shape(self):
        return (self.resolution // 8, self.resolution // 8, 4)

    @property
    def fid_stat(self):
        return f"assets/fid_stats/fid_stats_imagenet{self.resolution}_guided_diffusion.npz"


class CFGLabelDataset:
    """Label-null CFG dropout for class-conditional models
    (reference `datasets.py:45-58`)."""

    def __init__(self, dataset, p_uncond: float, null_label: int):
        self.dataset = dataset
        self.p_uncond = p_uncond
        self.null_label = null_label

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, item):
        x, y = self.dataset[item]
        if random.random() < self.p_uncond:
            y = self.null_label
        return x, y


def min_pool_2d(x: np.ndarray, k: int) -> np.ndarray:
    """k x k min-pool of an (H, W) map — the reference downsamples panoptic maps
    256 -> 64 with MinPool2d(4) (reference `datasets.py:591`)."""
    h, w = x.shape
    return x.reshape(h // k, k, w // k, k).min(axis=(1, 3))


class MSCOCOFeatureDataset:
    """Pre-encoded MS-COCO sample: (latent moments, CLIP context, panoptic map)
    (reference `datasets.py:564-613`).

    File contract per index i: `{i}.npy` moments (8, 32, 32) CHW;
    `{i}_{k}.npy` per-caption CLIP context (77, 768), k in 0..4 chosen at
    random; `{i}_seg.npy` seg map (256, 256) int, min-pooled to mask_size."""

    def __init__(self, path: str, num_captions: int = 5, mask_size: int = 64,
                 deterministic: bool = False, return_index: bool = False):
        self.path = path
        self.num_captions = num_captions
        self.mask_size = mask_size
        self.deterministic = deterministic
        self.return_index = return_index
        names = [n for n in os.listdir(path) if n.endswith("_seg.npy")]
        # A plain (non-panoptic) t2i extraction has no {i}_seg.npy files —
        # enumerate the {i}.npy moments instead and omit the panoptic field.
        self.has_seg = bool(names)
        if self.has_seg:
            self.indices = sorted(int(n.split("_")[0]) for n in names)
        else:
            self.indices = sorted(
                int(n[:-4]) for n in os.listdir(path)
                if n.endswith(".npy") and n[:-4].isdigit()
            )

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, item):
        i = self.indices[item]
        z = np.load(os.path.join(self.path, f"{i}.npy"))  # (2C, h, w) moments
        k = 0 if self.deterministic else random.randint(0, self.num_captions - 1)
        context = np.load(os.path.join(self.path, f"{i}_{k}.npy"))
        out = (
            np.ascontiguousarray(z.transpose(1, 2, 0)).astype(np.float32),
            context.astype(np.float32),
        )
        if self.has_seg:
            seg = np.load(os.path.join(self.path, f"{i}_seg.npy"))
            pool = seg.shape[0] // self.mask_size
            if pool > 1:
                seg = min_pool_2d(seg, pool)
            out = (*out, seg[..., None].astype(np.int32))  # (H, W, 1)
        if self.return_index:
            return (*out, i)
        return out


class MSCOCO256Features(DatasetFactory):
    """mscoco256_features (reference `datasets.py:616-652`): train/val feature
    dirs, `empty_context.npy` for CFG, `run_vis` contexts for fixed prompts."""

    def __init__(self, path: str, cfg: bool = False, p_uncond: Optional[float] = None,
                 mask_size: int = 64):
        super().__init__()
        self.path = path
        self.resolution = 256
        train = MSCOCOFeatureDataset(
            os.path.join(path, "train"), mask_size=mask_size
        )
        self.test = MSCOCOFeatureDataset(
            os.path.join(path, "val"), mask_size=mask_size, deterministic=True,
            return_index=True,
        )
        self.empty_context = np.load(os.path.join(path, "empty_context.npy"))
        if cfg:
            assert p_uncond is not None
            self.train = CFGDataset(train, p_uncond, self.empty_context)
        else:
            self.train = train
        vis_path = os.path.join(path, "run_vis")
        self.contexts = None
        if os.path.isdir(vis_path):
            ctx = [
                np.load(os.path.join(vis_path, n))
                for n in sorted(os.listdir(vis_path))
                if n.endswith(".npy")
            ]
            if ctx:
                self.contexts = np.stack(ctx)

    @property
    def data_shape(self):
        return (32, 32, 4)

    @property
    def fid_stat(self):
        return "assets/fid_stats/fid_stats_mscoco256_val.npz"


# --------------------------------------------------------------------------
# Synthetic dataset (tests / benchmarks; no reference analogue)
# --------------------------------------------------------------------------


class SyntheticDataset:
    def __init__(self, shapes, n: int = 256, seed: int = 0, int_fields=()):
        rng = np.random.default_rng(seed)
        self.fields = []
        for i, shape in enumerate(shapes):
            if i in int_fields:
                self.fields.append(rng.integers(0, 201, size=(n, *shape)).astype(np.int32))
            else:
                self.fields.append(rng.normal(size=(n, *shape)).astype(np.float32))
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, item):
        vals = tuple(f[item] for f in self.fields)
        return vals if len(vals) > 1 else vals[0]


class SyntheticLabeled:
    """(array, int label) pairs for class-conditional tasks."""

    def __init__(self, shape, n: int, num_classes: int, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.x = rng.normal(size=(n, *shape)).astype(np.float32)
        self.y = rng.integers(0, num_classes, n).astype(np.int32)

    def __len__(self):
        return len(self.x)

    def __getitem__(self, item):
        return self.x[item], int(self.y[item])


class Synthetic(DatasetFactory):
    """Synthetic data for tests/benches; `style` selects the task shape:
    'coco' (moments, context, panoptic), 'imagenet' (moments, label),
    'pixels' (image, label)."""

    def __init__(self, n: int = 256, z_shape=(32, 32, 8), clip_shape=(77, 768),
                 mask_size: int = 64, panoptic: bool = True, seed: int = 0,
                 style: str = "coco", num_classes: int = 10):
        super().__init__()
        self.style = style
        if style == "coco":
            shapes = [z_shape, clip_shape]
            int_fields = ()
            if panoptic:
                shapes.append((mask_size, mask_size, 1))
                int_fields = (2,)
            self.train = SyntheticDataset(shapes, n=n, seed=seed, int_fields=int_fields)
            self.empty_context = np.zeros(clip_shape, dtype=np.float32)
        elif style in ("imagenet", "pixels"):
            self.train = SyntheticLabeled(z_shape, n, num_classes, seed=seed)
        else:
            raise ValueError(style)
        self.test = self.train
        self._z_shape = z_shape

    @property
    def data_shape(self):
        return self._z_shape

    @property
    def has_label(self):
        return True

    @property
    def fid_stat(self):
        return None


def get_dataset(name: str, **kwargs) -> DatasetFactory:
    """Factory dispatch (reference `datasets.py:655-669`)."""
    if name == "cifar10":
        return CIFAR10(**kwargs)
    if name == "celeba":
        return CelebA(**kwargs)
    if name == "imagenet":
        return ImageNetRaw(**kwargs)
    if name in ("imagenet256_features", "imagenet512_features"):
        res = 256 if "256" in name else 512
        return ImageNetFeatures(resolution=res, **kwargs)
    if name == "mscoco256_features":
        return MSCOCO256Features(**kwargs)
    if name == "synthetic":
        return Synthetic(**kwargs)
    raise NotImplementedError(name)
