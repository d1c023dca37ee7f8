from .metrics import FrechetDistance, codebook_usage, psnr, ssim, vgg_feature_fn

__all__ = ["psnr", "ssim", "FrechetDistance", "codebook_usage",
           "vgg_feature_fn"]
