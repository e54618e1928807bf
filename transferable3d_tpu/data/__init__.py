from transferable3d_tpu.data.provider import FrustumDataset, FrustumRecord  # noqa: F401
