import eacham_tpu.fp  # noqa: F401  (fp32-matmul policy, must precede tracing)
from eacham_tpu.parallel.mesh import make_mesh
from eacham_tpu.parallel.matching import match_all_pairs_sharded
from eacham_tpu.parallel.ba import refine_ba_sharded
