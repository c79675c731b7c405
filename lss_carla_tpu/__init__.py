"""lss_carla_tpu — a TPU-native (JAX/XLA/Flax/Pallas) camera-to-BEV engine.

A brand-new rebuild of the capabilities of the LSS-Carla reference (a PyTorch
Lift-Splat-Shoot implementation for the SimBEV/CARLA dataset), designed
TPU-first:

* the whole per-step pipeline (geometry -> 6x EfficientNet-B0 -> depth-softmax
  frustum lift -> fixed-shape splat -> BEV encoder -> BCE loss -> grads ->
  Adam) traces into a single XLA program with static shapes;
* the reference's rank-sort + QuickCumsum scatter (reference
  ``src/models.py:204-246`` + ``src/tools.py:182-219``) is replaced by a
  fixed-shape scatter-add / Pallas kernel over the 200x200 grid;
* batch data parallelism runs via ``shard_map`` over a ``jax.sharding.Mesh``
  with ``psum`` gradient reduction on ICI.

Public API mirrors the reference surface: ``compile_model``, ``compile_data``,
``grid_conf`` / ``data_aug_conf`` schemas, ``SimpleLoss``/``get_batch_iou``/
``get_val_info`` equivalents.
"""

__version__ = "0.1.0"

from lss_carla_tpu.configs import GridConf, DataAugConf  # noqa: F401
