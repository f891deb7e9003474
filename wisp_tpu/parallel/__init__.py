from wisp_tpu.parallel.data_parallel import (make_mesh, shard_batch, replicate_tree,
                                             batch_sharding, replicated, DATA_AXIS,
                                             num_devices)
from wisp_tpu.parallel.multihost import (ProcessShardedDataset, global_batch_from_local,
                                         process_view_split)
