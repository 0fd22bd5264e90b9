"""lgm_tpu — a TPU-native large multi-view Gaussian reconstruction framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of LGM
(reference surveyed in SURVEY.md): image/text -> multi-view diffusion ->
splatter-image U-Net -> differentiable Gaussian splat rendering -> mesh.

Subpackages
-----------
- ``lgm_tpu.config``    typed configuration + presets (ref: core/options.py)
- ``lgm_tpu.utils``     camera math, rays, augmentations (ref: core/utils.py)
- ``lgm_tpu.ops``       Pallas/XLA kernels: gsplat rasterizer, attention
- ``lgm_tpu.models``    Flax models: multi-view U-Net, LGM, LPIPS
- ``lgm_tpu.data``      data pipeline (ref: core/provider_*.py)
- ``lgm_tpu.parallel``  mesh/sharding/training-state utilities
- ``lgm_tpu.io``        PLY import/export, image/video output
- ``lgm_tpu.diffusion`` MVDream/ImageDream diffusion front-end
"""

__version__ = "0.1.0"

from lgm_tpu.config import Options, get_config  # noqa: F401
