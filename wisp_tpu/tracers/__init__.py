from wisp_tpu.tracers.base_tracer import BaseTracer
from wisp_tpu.tracers.packed_rf_tracer import PackedRFTracer
