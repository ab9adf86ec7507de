from .mesh import make_mesh, batch_sharding, replicated_sharding, token_sharding
from .sharding import shard_params_rules, shard_opt_state_rules, apply_sharding
