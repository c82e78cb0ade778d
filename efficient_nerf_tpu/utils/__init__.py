from .logging import Logger
from .meters import AverageMeter, LossLine, ProgressMeter, Timer, count_params
from .images import save_image, save_video, to8b
from .profiling import DeviceTimer, compiled_cost, time_fn, trace
from .debug import assert_finite, debug_nans, find_nonfinite
from .visualize import plot_pose_cloud, visualize_3d
