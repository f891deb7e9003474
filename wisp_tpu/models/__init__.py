from wisp_tpu.models.pipeline import Pipeline, RasterizationPipeline
from wisp_tpu.models.activations import get_activation_class
from wisp_tpu.models.layers import get_layer_class, Linear
from wisp_tpu.models.conditioners import FiLM, FiLMConditioner
