from evoworld_tpu.eval.metrics import psnr, ssim, frechet_distance, batch_video_metrics

__all__ = ["psnr", "ssim", "frechet_distance", "batch_video_metrics"]
