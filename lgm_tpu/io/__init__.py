from lgm_tpu.io.ply import load_ply, save_ply  # noqa: F401
