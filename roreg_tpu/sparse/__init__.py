from roreg_tpu.sparse.voxelize import VoxelGrid, voxelize
from roreg_tpu.sparse.kernel_map import SparsePyramid, build_pyramid
