from eacham_tpu.features.deep.superpoint import SuperPointNet, extract_deep
from eacham_tpu.features.deep.lightglue import LightGlueMatcher, match_deep
