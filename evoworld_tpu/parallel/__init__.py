from evoworld_tpu.parallel.mesh import make_mesh, shard_batch, shard_params_tp, replicate

__all__ = ["make_mesh", "shard_batch", "shard_params_tp", "replicate"]
