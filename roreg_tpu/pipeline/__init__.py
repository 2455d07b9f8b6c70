from roreg_tpu.pipeline.config import PipelineConfig
from roreg_tpu.pipeline.registration import RegistrationPipeline
