from .mesh import (batch_sharding, host_subset, initialize_distributed,
                   make_mesh, replicated, shard_batch, shard_params_tp)
from .render import make_sharded_r2l_forward
from .train import make_sharded_r2l_train_step, make_sharded_teacher_train_step
