from roreg_tpu.models.gf import GroupFeatNetwork, des_to_dr_index
from roreg_tpu.models.rd import RotationDetector
from roreg_tpu.models.et import EquivariantTransformer
from roreg_tpu.models.rm import RotationCoherenceMatcher
