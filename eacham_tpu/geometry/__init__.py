import eacham_tpu.fp  # noqa: F401  (fp32-matmul policy, must precede tracing)
from eacham_tpu.geometry.se3 import (
    hat,
    exp_se3,
    log_se3,
    retract,
    inverse_se3,
    transform_points,
    camera_center,
)
from eacham_tpu.geometry.camera import (
    make_intrinsics,
    intrinsics_from_image_size,
    project,
    project_hom,
    backproject,
    pixel_to_normalized,
    reprojection_error,
)
from eacham_tpu.geometry.triangulation import (
    triangulate_dlt,
    triangulation_angle,
    is_positive_depth,
    triangulate_consensus,
)
