from lgm_tpu.models.unet import UNet, MVAttention, ResnetBlock  # noqa: F401
from lgm_tpu.models.lgm import LGM  # noqa: F401
