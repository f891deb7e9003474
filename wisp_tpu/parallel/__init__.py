from wisp_tpu.parallel.data_parallel import (make_mesh, shard_batch, replicate_tree,
                                             batch_sharding, replicated, DATA_AXIS,
                                             num_devices, batch_partition_specs,
                                             dp_shard_map)
from wisp_tpu.parallel.multihost import (ProcessShardedDataset, global_batch_from_local,
                                         process_view_split)
