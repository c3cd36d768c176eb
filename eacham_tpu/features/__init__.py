import eacham_tpu.fp  # noqa: F401  (fp32-matmul policy, must precede tracing)
from eacham_tpu.features.detector import detect_keypoints, build_scale_space
from eacham_tpu.features.descriptor import describe_keypoints
from eacham_tpu.features.matching import match_pair, match_all_pairs
from eacham_tpu.features.frontend import extract_features, ClassicalFrontend
