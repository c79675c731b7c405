from lss_carla_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, replicate)
from lss_carla_tpu.parallel.step import (  # noqa: F401
    make_sharded_train_step, make_sharded_eval_step)
