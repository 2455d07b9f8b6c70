from roreg_tpu.native.lib import (
    native_available,
    voxelize_host,
    voxel_nn_host,
    mutual_pairs_host,
)
