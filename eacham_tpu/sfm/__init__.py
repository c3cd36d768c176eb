import eacham_tpu.fp  # noqa: F401  (fp32-matmul policy, must precede tracing)
from eacham_tpu.sfm.scene import Scene, make_scene, ba_problem_from_scene
from eacham_tpu.sfm.matches import build_match_tables, observers_of_frame
from eacham_tpu.sfm.twoview import recover_pose_two_view, find_best_pair
from eacham_tpu.sfm.triangulate import triangulate_frame
from eacham_tpu.sfm.pipeline import run_sfm, resume_sfm, SfmOptions
from eacham_tpu.sfm.anchors import anchors_in_estimate_frame
