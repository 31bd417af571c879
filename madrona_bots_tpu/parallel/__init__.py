from madrona_bots_tpu.parallel.mesh import make_mesh, shard_state, state_sharding
from madrona_bots_tpu.parallel.sharded import make_sharded_train_tick

__all__ = ["make_mesh", "shard_state", "state_sharding",
           "make_sharded_train_tick"]
