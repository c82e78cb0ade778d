from .schedules import make_lr_schedule, parse_warmup
from .hard_mining import (HardPool, hard_pool_init, pick_hard_rays,
                          update_hard_pool)
from .steps import (TrainState, init_train_state, make_patch_train_step,
                    make_r2l_train_step, make_teacher_train_step,
                    mse_to_psnr)
from .checkpoints import (import_reference_checkpoint, load_checkpoint,
                          restore_train_state, save_checkpoint)
