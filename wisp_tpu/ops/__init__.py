from wisp_tpu.ops import grid, geometric, differential
