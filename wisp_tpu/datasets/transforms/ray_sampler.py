"""SampleRays — per-batch random ray subsampling transform
(reference wisp/datasets/transforms/ray_sampler.py:13-35). Host-side numpy sampling; the
mutable ``num_samples`` is driven by the trainer's adaptive ray batching, quantized to
power-of-two buckets upstream so batch shapes stay jit-cache-friendly."""

from __future__ import annotations

import numpy as np

from wisp_tpu.datasets.batch import MultiviewBatch


class SampleRays:
    def __init__(self, num_samples: int, seed: int = 0):
        self.num_samples = num_samples
        self._rng = np.random.default_rng(seed)

    def set_num_samples(self, num_samples: int) -> None:
        self.num_samples = num_samples

    def __call__(self, inputs: MultiviewBatch) -> MultiviewBatch:
        n = inputs["rays"].shape[0]
        ray_idx = self._rng.integers(0, n, size=(self.num_samples,))
        out = MultiviewBatch(rays=inputs["rays"][ray_idx])
        for channel_name, ray_value in inputs.ray_values().items():
            out[channel_name] = ray_value[ray_idx]
        return out
