"""Optional Grain pipeline tests (skipped if grain is unavailable)."""
import numpy as np
import pytest
from PIL import Image

grain = pytest.importorskip("grain")

from textmae_tpu.data import ImageScoreDataset
from textmae_tpu.data.grain_pipeline import grain_batch_iterator


@pytest.fixture
def tiny_dataset(tmp_path, rng):
    root = tmp_path / "mini"
    (root / "train").mkdir(parents=True)
    n = 6
    for i in range(n):
        arr = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)
        Image.fromarray(arr).save(root / "train" / f"img{i}.png")
    scores_dir = tmp_path / "mini_scores"
    scores_dir.mkdir()
    np.save(scores_dir / "train.npy", rng.random((n, 196)).astype(np.float32))
    return root


def test_grain_iterator_shapes(tiny_dataset):
    ds = ImageScoreDataset(tiny_dataset, "train", img_size=32)
    batches = list(grain_batch_iterator(ds, 2, seed=1, epoch=0))
    assert len(batches) == 3
    imgs, scores = batches[0]
    assert imgs.shape == (2, 3, 32, 32)
    assert scores.shape == (2, 196)


def test_grain_deterministic_and_sharded(tiny_dataset):
    ds = ImageScoreDataset(tiny_dataset, "train", img_size=32)
    a = [s.sum() for _, s in grain_batch_iterator(ds, 2, seed=3, epoch=1)]
    b = [s.sum() for _, s in grain_batch_iterator(ds, 2, seed=3, epoch=1)]
    assert a == b
    c = [s.sum() for _, s in grain_batch_iterator(ds, 2, seed=3, epoch=2)]
    assert a != c  # new epoch, new order
    n0 = sum(
        i.shape[0]
        for i, _ in grain_batch_iterator(ds, 2, drop_last=False, shard_index=0, shard_count=2)
    )
    n1 = sum(
        i.shape[0]
        for i, _ in grain_batch_iterator(ds, 2, drop_last=False, shard_index=1, shard_count=2)
    )
    assert n0 + n1 == 6
