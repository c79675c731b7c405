from lss_carla_tpu.models.lss import LiftSplatShoot, compile_model  # noqa: F401
from lss_carla_tpu.models.camencode import CamEncode  # noqa: F401
from lss_carla_tpu.models.bevencode import BevEncode  # noqa: F401
from lss_carla_tpu.models.efficientnet import EfficientNetTrunk  # noqa: F401
