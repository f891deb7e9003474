from wisp_tpu.datasets.base_datasets import WispDataset, MultiviewDataset, SDFDataset
from wisp_tpu.datasets.batch import Batch, MultiviewBatch, SDFBatch
from wisp_tpu.datasets.image_dataset import ImageDataset
from wisp_tpu.datasets.random_view_dataset import RandomViewDataset
from wisp_tpu.datasets.utils import load_multiview_dataset, load_sdf_dataset
