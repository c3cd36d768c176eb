from eacham_tpu.utils.evaluate import align_umeyama, ate_rmse
from eacham_tpu.utils.timer import BlockTimer, print_stats
