"""ResNet-18/34 camera trunk — an MXU-friendly alternative to EfficientNet.

The reference's camera encoder is EfficientNet-B0 only (reference
``src/models.py:43``). Its depthwise convolutions and squeeze-excitation run
on the TPU's VPU at a few percent of peak, leaving a small-op tail in the
step profile (docs/ROADMAP.md item 2). This trunk is the opt-in alternative:
plain dense 3x3 convolutions (torchvision resnet18/34 topology, the same
BasicBlock the reference's BevEncode already borrows from torchvision at
``src/models.py:96``) that tile straight onto the MXU.

Endpoint contract matches ``EfficientNetTrunk``: ``reduction_4`` = the
stride-16 feature map (layer3 output, 256ch), ``reduction_5`` = stride-32
(layer4 output, 512ch), so ``CamEncode``'s Up-fuse + depthnet head is reused
unchanged. Select with ``--variant resnet18`` / ``resnet34``.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from lss_carla_tpu.models.layers import BasicBlock, Dtype, kaiming_out, torch_pad

# stage widths are fixed across resnet18/34; only block counts differ
_STAGE_FEATURES = (64, 128, 256, 512)
RESNET_LAYERS = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
}


class ResNetTrunk(nn.Module):
    """conv7x7/s2 + maxpool + layer1..4, harvesting stride-16/32 endpoints."""
    variant: str = "resnet18"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool) -> Dict[str, jnp.ndarray]:
        layers = RESNET_LAYERS[self.variant]
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=torch_pad(7),
                    use_bias=False, kernel_init=kaiming_out, name="conv1",
                    dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        endpoints: Dict[str, jnp.ndarray] = {}
        for stage, (feats, reps) in enumerate(zip(_STAGE_FEATURES, layers)):
            for r in range(reps):
                stride = 2 if (stage > 0 and r == 0) else 1
                x = BasicBlock(feats, stride=stride,
                               name=f"layer{stage + 1}_{r}",
                               dtype=self.dtype)(x, train)
            if stage == 2:
                endpoints["reduction_4"] = x     # stride 16, 256ch
            elif stage == 3:
                endpoints["reduction_5"] = x     # stride 32, 512ch
        return endpoints

    @staticmethod
    def endpoint_channels(variant: str) -> Dict[str, int]:
        del variant
        return {"reduction_4": 256, "reduction_5": 512}
