from lss_carla_tpu.training.loss import (  # noqa: F401
    bce_with_logits, SimpleLoss, get_batch_iou, get_batch_iou_counts)
from lss_carla_tpu.training.state import TrainState, create_train_state  # noqa: F401
from lss_carla_tpu.training.step import make_train_step, make_eval_step  # noqa: F401
