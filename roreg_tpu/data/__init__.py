from roreg_tpu.data.ply import read_ply, write_ply
from roreg_tpu.data.dataset import ThreeDMatchDataset, get_dataset_group
