from wisp_tpu.models.nefs.base_nef import BaseNeuralField
from wisp_tpu.models.nefs.image_nef import ImageNeuralField
from wisp_tpu.models.nefs.nerf import NeuralRadianceField
