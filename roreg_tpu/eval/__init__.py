from roreg_tpu.eval.metrics import fmr_ir, registration_errors
from roreg_tpu.eval.benchmark import (
    read_trajectory,
    read_trajectory_info,
    evaluate_registration,
    benchmark_scenes,
)
