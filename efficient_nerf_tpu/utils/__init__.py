from .logging import Logger
from .meters import AverageMeter, LossLine, ProgressMeter, Timer, count_params
from .images import save_image, save_video, to8b
