from eacham_tpu.io.config import SfmConfig, parse_config, load_config
from eacham_tpu.io.images import load_image_dir, downsize_policy
from eacham_tpu.io.saver import save_positions
from eacham_tpu.io.nerf import transform_to_nerf
from eacham_tpu.io.checkpoint import save_scene, load_scene
from eacham_tpu.io.export import export_cloud, export_trajectory, landmark_colors
from eacham_tpu.io.stream import ReplaySource, drain
