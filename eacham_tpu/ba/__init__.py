from eacham_tpu.ba.core import BAProblem, BAConfig, refine_ba, ba_cost
