from .blender import BlenderData, composite_white, load_blender_data
from .llff import LLFFData, load_llff_data, minify
from .deepvoxels import DeepVoxelsData, load_dv_data
from .rays_dataset import RayShardDataset, ShardLoader, infinite_indices
from .convert import (convert_blender_to_rays, convert_llff_to_rays,
                      rays_to_shards)
from .pseudo import (ShuffleBuffer, StreamingPseudoGenerator,
                     export_pseudo_shards, make_pseudo_frame_renderer)
