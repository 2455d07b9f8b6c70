from roreg_tpu.utils.profiling import StageTimer, JsonlLogger
