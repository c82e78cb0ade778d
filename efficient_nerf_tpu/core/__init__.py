from .rays import (get_rays, get_rays_np, ndc_rays, pixel_dirs, plucker_rays,
                   translate_origin_fixed)
from .sampling import linear_zvals, sample_pdf, stratified_sample, stratify_zvals
from .volume import (RenderOutputs, exclusive_cumprod, raw2outputs,
                     raw2outputs_cm)
from .encoding import nerf_embed, nerf_embed_dim, ray_embed, ray_embed_dim
from .ray_sampler import sample_image_points, sample_ray_points
from . import poses
