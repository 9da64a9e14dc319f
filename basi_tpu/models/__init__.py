"""Model zoo: backbones (ResNet-50 / VGG16), FPN decoder, BASI heads."""

from basi_tpu.models.basi import BASINet, BASIOutputs  # noqa: F401
from basi_tpu.models.fpn import FPNDecoder  # noqa: F401
from basi_tpu.models.resnet import ResNet50  # noqa: F401
from basi_tpu.models.vgg import VGG16  # noqa: F401
