from nnal_tpu.models.specs import (
    CNNSpec,
    Layer,
    create_model,
    create_pw1,
    create_vgg,
    create_densenet_2block,
    create_tiramisu103,
)
from nnal_tpu.models.cnn import init_cnn, apply_cnn, CNNOutput
