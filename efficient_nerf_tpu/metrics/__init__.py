from .psnr import img2mse, mse2psnr, psnr
from .ssim import ssim, ssim_image
from .flip import default_pixels_per_degree, flip, flip_error_map
from .lpips import lpips, lpips_available
