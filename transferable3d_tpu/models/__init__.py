from transferable3d_tpu.models import layers, model_util  # noqa: F401
from transferable3d_tpu.models.registry import get_model  # noqa: F401
