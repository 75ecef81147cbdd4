from .metrics import mse2psnr, psnr, rgb_lpips, rgb_ssim, ws_ssim
from .renderer import Renderer, evaluation, evaluation_path
from .viz import to_uint8, visualize_depth
