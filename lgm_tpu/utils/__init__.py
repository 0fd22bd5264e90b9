from lgm_tpu.utils import camera  # noqa: F401
