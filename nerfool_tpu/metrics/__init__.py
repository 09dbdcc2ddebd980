from nerfool_tpu.metrics.image import psnr, ssim, ssim_windowed, mse2psnr, img2psnr
from nerfool_tpu.metrics.lpips import LPIPS, load_lpips_weights
