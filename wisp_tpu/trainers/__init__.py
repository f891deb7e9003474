from wisp_tpu.trainers.base_trainer import BaseTrainer, ConfigBaseTrainer, load_pipeline
from wisp_tpu.trainers.image_trainer import ImageTrainer
from wisp_tpu.trainers.multiview_trainer import MultiviewTrainer, ConfigMultiviewTrainer
from wisp_tpu.trainers.sdf_trainer import SDFTrainer, ConfigSDFTrainer
