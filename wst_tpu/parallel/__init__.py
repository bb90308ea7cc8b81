from wst_tpu.parallel.mesh import (make_mesh, data_sharding, model_sharding,
                                   replicated_sharding, initialize_multihost)
from wst_tpu.parallel.distributed import DistributedTrainer

__all__ = ["make_mesh", "data_sharding", "model_sharding",
           "replicated_sharding", "initialize_multihost",
           "DistributedTrainer"]
