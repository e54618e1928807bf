from transferable3d_tpu.core import bins, geometry, box_np  # noqa: F401
