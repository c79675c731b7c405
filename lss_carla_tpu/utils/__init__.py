from lss_carla_tpu.utils.logging import MetricLogger  # noqa: F401
from lss_carla_tpu.utils.checkpoint import CheckpointManager  # noqa: F401
