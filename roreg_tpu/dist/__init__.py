from roreg_tpu.dist.mesh import make_mesh, shard_train_step, replicate
