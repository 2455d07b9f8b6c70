from roreg_tpu.core.group import IcosahedralGroup, get_group
