from lss_carla_tpu.data.simbev import (  # noqa: F401
    CAMERA_ORDER, SimBEVDataset, SegmentationData, VizData)
from lss_carla_tpu.data.loader import compile_data, DataLoader  # noqa: F401
from lss_carla_tpu.data.augment import img_transform, sample_augmentation  # noqa: F401
