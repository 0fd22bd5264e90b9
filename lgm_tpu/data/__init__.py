from lgm_tpu.data.synthetic import SyntheticDataset, make_batch  # noqa: F401
