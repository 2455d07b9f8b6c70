from roreg_tpu.train.losses import gf_loss, rd_loss, rm_loss, et_loss, name2loss
