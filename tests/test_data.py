"""Data pipeline tests: h5 format parity, loader batching/shuffle/prefetch,
paired transforms sharing crop/flip decisions."""

import os

import numpy as np
import pytest

from fdgan_tpu.data import DataLoader, PairedH5Dataset, get_loader
from fdgan_tpu.data.h5 import ValH5Dataset
from fdgan_tpu.data import transforms as T

h5py = pytest.importorskip("h5py")


@pytest.fixture
def h5_root(tmp_path, np_rng):
    for i in range(5):
        gt = np_rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
        haze = np.clip(gt + 0.2, 0, 1)
        with h5py.File(tmp_path / f"{i}.h5", "w") as f:
            f.create_dataset("gt", data=gt)
            f.create_dataset("haze", data=haze)
    return str(tmp_path)


def test_dataset_format(h5_root):
    ds = PairedH5Dataset(h5_root)
    assert len(ds) == 5
    haze, gt = ds[0]
    assert haze.shape == (16, 16, 3) and gt.shape == (16, 16, 3)
    assert haze.dtype == np.float32
    # haze is the first element (network input), matching pix2pix.__getitem__
    assert (haze >= gt).all()


def test_val_dataset_keys(tmp_path, np_rng):
    with h5py.File(tmp_path / "0.h5", "w") as f:
        for k in ("haze", "gt", "trans", "ato"):
            f.create_dataset(k, data=np_rng.uniform(0, 1, (8, 8, 3)).astype(np.float32))
    ds = ValH5Dataset(str(tmp_path))
    item = ds[0]
    assert len(item) == 4


def test_loader_batching(h5_root):
    loader = DataLoader(PairedH5Dataset(h5_root), batch_size=2, shuffle=False, prefetch=0)
    batches = list(loader)
    assert len(batches) == 3  # 2+2+1
    assert batches[0][0].shape == (2, 16, 16, 3)
    assert batches[-1][0].shape == (1, 16, 16, 3)


def test_loader_prefetch_equivalent(h5_root):
    a = list(DataLoader(PairedH5Dataset(h5_root), batch_size=2, prefetch=0))
    b = list(DataLoader(PairedH5Dataset(h5_root), batch_size=2, prefetch=2))
    for (x1, y1), (x2, y2) in zip(a, b):
        np.testing.assert_array_equal(x1, x2)


def test_loader_shuffle_seeded(h5_root):
    l1 = list(DataLoader(PairedH5Dataset(h5_root), batch_size=5, shuffle=True, seed=3, prefetch=0))
    l2 = list(DataLoader(PairedH5Dataset(h5_root), batch_size=5, shuffle=True, seed=3, prefetch=0))
    np.testing.assert_array_equal(l1[0][0], l2[0][0])


def test_get_loader_dispatch(h5_root):
    loader = get_loader("pix2pix", h5_root, 16, 16, batch_size=1, shuffle=False)
    assert len(loader) == 5
    with pytest.raises(ValueError):
        get_loader("nope", h5_root, 16, 16)
    with pytest.raises(ValueError, match="pix2pix_val2"):
        get_loader("pix2pix_val2", h5_root, 16, 16)


def test_get_loader_new_resizes_input(tmp_path, np_rng):
    for i in range(2):
        with h5py.File(tmp_path / f"{i}.h5", "w") as f:
            f.create_dataset("input", data=np_rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
            f.create_dataset("target", data=np_rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
    loader = get_loader("new", str(tmp_path), 16, 16, batch_size=2, shuffle=False, workers=0)
    inp, tgt = next(iter(loader))
    # datasets/new.py:190-191 — input resized to 224², target untouched
    assert inp.shape == (2, 224, 224, 3)
    assert tgt.shape == (2, 16, 16, 3)


def test_get_loader_folder_and_classification(tmp_path, np_rng):
    from PIL import Image

    froot = tmp_path / "folder"
    for cls in ("a", "b"):
        (froot / cls).mkdir(parents=True)
        arr = (np_rng.uniform(0, 1, (8, 8, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(froot / cls / "0.png")
    loader = get_loader("folder", str(froot), 8, 8, batch_size=2, shuffle=False, workers=0)
    imgs, labels = next(iter(loader))
    assert imgs.shape == (2, 8, 8, 3) and set(labels.tolist()) == {0, 1}

    croot = tmp_path / "cls"
    croot.mkdir()
    with h5py.File(croot / "0.h5", "w") as f:
        f.create_dataset("haze", data=np_rng.uniform(0, 1, (8, 8, 3)).astype(np.float32))
        f.create_dataset("label", data=np.asarray(3.0))
    loader = get_loader("classification", str(croot), 8, 8, batch_size=1, shuffle=False, workers=0)
    haze, label = next(iter(loader))
    assert haze.shape == (1, 8, 8, 3) and label[0] == 2.0


def test_random_crop_shares_coords(np_rng):
    img_a = np.zeros((10, 10, 1), np.float32)
    img_b = np.zeros((10, 10, 1), np.float32)
    img_a[3, 4] = 1.0
    img_b[3, 4] = 1.0
    crop = T.RandomCrop(6)
    for _ in range(10):
        a, b = crop(img_a, img_b)
        np.testing.assert_array_equal(a, b)  # identical crops → marker aligned


def test_random_flip_shares_decision():
    a = np.arange(12, dtype=np.float32).reshape(2, 2, 3)
    b = a.copy()
    flip = T.RandomHorizontalFlip()
    for _ in range(10):
        fa, fb = flip(a, b)
        np.testing.assert_array_equal(fa, fb)


def test_compose_and_normalize():
    x = (np.ones((4, 4, 3)) * 128).astype(np.uint8)
    t = T.Compose([T.ToArray(), T.Normalize((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))])
    a, b = t(x, x)
    assert a.dtype == np.float32
    np.testing.assert_allclose(a, (128 / 255 - 0.5) / 0.5, atol=1e-6)


def test_scale_keeps_aspect():
    img = np.zeros((20, 10, 3), np.float32)
    (out,) = T.Scale(5)(img)
    assert out.shape == (10, 5, 3)


def test_center_crop():
    img = np.zeros((10, 10, 3), np.float32)
    (out,) = T.CenterCrop(6)(img)
    assert out.shape == (6, 6, 3)


def test_image_folder_deterministic(tmp_path, np_rng):
    from PIL import Image

    from fdgan_tpu.data.folder import ImageFolder

    for cls in ("clear", "hazy"):
        (tmp_path / cls).mkdir()
        for i in range(2):
            arr = (np_rng.uniform(0, 1, (8, 8, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / cls / f"{i}.png")
    ds = ImageFolder(str(tmp_path))
    assert len(ds) == 4
    assert ds.classes == ["clear", "hazy"]
    img0a, y0a = ds[0]
    img0b, y0b = ds[0]
    np.testing.assert_array_equal(img0a, img0b)  # deterministic (ref was random)
    assert {ds[i][1] for i in range(4)} == {0, 1}


def test_classification_h5(tmp_path, np_rng):
    from fdgan_tpu.data.folder import ClassificationH5

    with h5py.File(tmp_path / "0.h5", "w") as f:
        f.create_dataset("haze", data=np_rng.uniform(0, 1, (8, 8, 3)).astype(np.float32))
        f.create_dataset("label", data=np.asarray(2.0))
    ds = ClassificationH5(str(tmp_path))
    haze, label = ds[0]
    assert haze.shape == (8, 8, 3)
    assert label == 1.0  # mean - 1


def test_sharded_dataset_strided_and_truncated():
    """Multi-process view: process p of n sees items p, p+n, ...; lengths
    are truncated to the MIN shard so every process steps the same number
    of (collective) batches even when the file count is odd."""
    from fdgan_tpu.data.h5 import ShardedDataset

    base = list(range(9))  # odd: naive shards would be 5 and 4 → hang

    s0 = ShardedDataset(base, 0, 2)
    s1 = ShardedDataset(base, 1, 2)
    assert len(s0) == len(s1) == 4
    assert [s0[j] for j in range(4)] == [0, 2, 4, 6]
    assert [s1[j] for j in range(4)] == [1, 3, 5, 7]
    with pytest.raises(IndexError):
        s0[4]  # item 8 is truncated away, not silently readable
    with pytest.raises(ValueError):
        ShardedDataset(base, 2, 2)
    # single "process" is the identity view
    sd = ShardedDataset(base, 0, 1)
    assert len(sd) == 9 and sd[8] == 8


def test_get_loader_shard_dispatch(tmp_path, np_rng):
    from fdgan_tpu.data import get_loader

    for i in range(6):
        with h5py.File(tmp_path / f"{i}.h5", "w") as f:
            f.create_dataset("gt", data=np.full((4, 4, 3), i, np.float32))
            f.create_dataset("haze", data=np.full((4, 4, 3), i, np.float32))
    loader = get_loader("pix2pix", str(tmp_path), 4, 4, batch_size=1,
                        workers=0, shuffle=False, shard=(1, 2))
    vals = [float(h[0, 0, 0, 0]) for h, _ in loader]
    assert vals == [1.0, 3.0, 5.0]
