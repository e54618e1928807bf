from transferable3d_tpu.ops.sampling import farthest_point_sample, gather_points  # noqa: F401
from transferable3d_tpu.ops.grouping import ball_query, group_points  # noqa: F401
from transferable3d_tpu.ops.interpolate import three_nn, three_interpolate  # noqa: F401
