from .mesh import make_mesh, shard_batch, replicate, data_parallel_sharding
from .distributed import initialize_distributed
