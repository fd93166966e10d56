from copo_tpu.parallel.mesh import make_mesh, shard_train_state

__all__ = ["make_mesh", "shard_train_state"]
