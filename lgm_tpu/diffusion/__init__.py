from lgm_tpu.diffusion.mv_unet import (  # noqa: F401
    MultiViewUNetModel,
    get_camera,
    timestep_embedding,
)
from lgm_tpu.diffusion.ddim import DDIMScheduler  # noqa: F401
from lgm_tpu.diffusion.vae import AutoencoderKL  # noqa: F401
from lgm_tpu.diffusion.pipeline import MVDreamPipeline  # noqa: F401
