from wisp_tpu.models.nefs.base_nef import BaseNeuralField
from wisp_tpu.models.nefs.image_nef import ImageNeuralField
from wisp_tpu.models.nefs.nerf import NeuralRadianceField
from wisp_tpu.models.nefs.neural_sdf import NeuralSDF, NeuralSDFTex
from wisp_tpu.models.nefs.spc_field import SPCField
