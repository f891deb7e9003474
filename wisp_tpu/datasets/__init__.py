from wisp_tpu.datasets.base_datasets import WispDataset, MultiviewDataset, SDFDataset
from wisp_tpu.datasets.batch import Batch, MultiviewBatch, SDFBatch
from wisp_tpu.datasets.image_dataset import ImageDataset
