"""Image-quality metrics (PSNR / SSIM / LPIPS / completeness IoU)."""

from .psnr import psnr_metric
from .ssim import structural_similarity
from .iou import completeness_iou
from .lpips import LPIPS

__all__ = ["psnr_metric", "structural_similarity", "completeness_iou",
           "LPIPS"]
