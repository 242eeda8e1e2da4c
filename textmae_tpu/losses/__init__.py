from textmae_tpu.losses.rd_loss import RateDistortionLoss, rate_distortion_loss
from textmae_tpu.losses.vgg import VGG16Features, vgg_feature_loss

__all__ = [
    "RateDistortionLoss",
    "rate_distortion_loss",
    "VGG16Features",
    "vgg_feature_loss",
]
