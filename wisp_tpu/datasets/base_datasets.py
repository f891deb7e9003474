"""Dataset base classes (reference wisp/datasets/base_datasets.py:18-223).

Host-side numpy data pipelines; the trainer moves sampled batches to device at the jit
boundary. ``load()`` routes single/multi-process loading; format classes implement
``is_root_of_dataset`` sniffing so ``load_multiview_dataset`` can auto-detect formats
(reference datasets/utils.py:21)."""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np


class WispDataset:
    def __init__(self, dataset_path: Optional[str] = None, dataset_num_workers: int = -1,
                 transform: Optional[Callable] = None, split: Optional[str] = None):
        self.dataset_path = dataset_path
        self.dataset_num_workers = dataset_num_workers
        self.transform = transform
        self.split = split

    def load(self):
        """Route to single- or multi-process loading (reference base_datasets.py:95-121)."""
        if self.dataset_num_workers > 0:
            return self.load_multiprocess()
        return self.load_singleprocess()

    def load_singleprocess(self):
        raise NotImplementedError

    def load_multiprocess(self):
        return self.load_singleprocess()

    def create_split(self, split: str, transform: Optional[Callable] = None):
        """Create a sibling dataset over another split (reference base_datasets.py:67-93)."""
        raise NotImplementedError

    @classmethod
    def is_root_of_dataset(cls, root: str, files_list: List[str]) -> bool:
        """Format sniffing for auto-detection (reference base_datasets.py:123-145)."""
        return False

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, idx):
        raise NotImplementedError

    @property
    def coordinates(self) -> Optional[np.ndarray]:
        return None

    def name(self) -> str:
        return type(self).__name__

    def public_properties(self) -> dict:
        return {}


class MultiviewDataset(WispDataset):
    """Base for posed-image datasets (reference base_datasets.py:148-194)."""

    @property
    def img_shape(self):
        raise NotImplementedError

    @property
    def num_images(self) -> int:
        raise NotImplementedError

    @property
    def cameras(self):
        raise NotImplementedError

    def as_pointcloud(self) -> Optional[np.ndarray]:
        """Depth-derived pointcloud for BLAS pre-pruning, if depth is available
        (reference base_datasets.py:176-187)."""
        return None

    @property
    def supports_depth(self) -> bool:
        return False


class SDFDataset(WispDataset):
    """Base for coordinate/sdf sample datasets (reference base_datasets.py:197-223)."""

    def resample(self):
        """Regenerate samples (called between epochs by SDFTrainer)."""
        pass

    @property
    def coordinates(self) -> Optional[np.ndarray]:
        raise NotImplementedError
