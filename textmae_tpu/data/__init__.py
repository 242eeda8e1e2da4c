"""Host-side data pipeline: score maps, datasets, loaders.

The device never sees PIL/cv2; images and precomputed patch scores are
assembled into numpy batches on the host and fed to jitted steps.
"""
from textmae_tpu.data.score_maps import (
    division_merge_segment,
    laplacian_map,
    patch_scores,
    total_score_for_image,
)
from textmae_tpu.data.dataset import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    ImageScoreDataset,
    batch_iterator,
    load_scores_file,
)
from textmae_tpu.data.paths import DATASET_PATHS, resolve_dataset

__all__ = [
    "division_merge_segment",
    "laplacian_map",
    "patch_scores",
    "total_score_for_image",
    "ImageScoreDataset",
    "batch_iterator",
    "load_scores_file",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "DATASET_PATHS",
    "resolve_dataset",
]
