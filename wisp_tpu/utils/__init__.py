from wisp_tpu.utils.filter import (TreeSpec, partition, filter_grad,
                                   filter_value_and_grad, is_inexact_array)
from wisp_tpu.utils.perf import PerfTimer, profile_trace, named_scope
