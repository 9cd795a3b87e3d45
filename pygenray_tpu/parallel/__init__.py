from .sharding import make_mesh, pad_to_multiple, replicate_env, shard_rays
