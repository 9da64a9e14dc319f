"""torch -> JAX checkpoint conversion (SURVEY §7 step 2)."""

from basi_tpu.convert.torch_import import (  # noqa: F401
    import_resnet50_backbone,
    import_vgg16_backbone,
)
