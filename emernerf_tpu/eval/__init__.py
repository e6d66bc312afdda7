from emernerf_tpu.eval.metrics import compute_psnr, compute_ssim, compute_valid_depth_rmse
from emernerf_tpu.eval.renderer import ImageRenderer

__all__ = ["compute_psnr", "compute_ssim", "compute_valid_depth_rmse", "ImageRenderer"]
