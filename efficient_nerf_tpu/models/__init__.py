from .nerf import NeRFMLP
from .r2l import R2LConvNet, R2LNet, ResBlock, get_activation
from . import torch_import
from .flops import linear_flops, nerf_flops_per_pixel, r2l_flops_per_pixel
