from lss_carla_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, replicate)
from lss_carla_tpu.parallel.step import (  # noqa: F401
    make_sharded_train_step, make_sharded_eval_step)
from lss_carla_tpu.parallel.camera import (  # noqa: F401
    make_mesh_2d, shard_batch_2d, make_camera_sharded_predict,
    make_camera_sharded_train_step, make_camera_sharded_eval_step)
from lss_carla_tpu.parallel.grid import (  # noqa: F401
    make_mesh_grid, shard_batch_grid, make_grid_sharded_predict,
    make_grid_sharded_train_step, make_grid_sharded_eval_step)
