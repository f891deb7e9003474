from wisp_tpu.datasets.transforms.ray_sampler import SampleRays
