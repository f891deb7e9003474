"""Dataset auto-detection utilities (reference wisp/datasets/utils.py:21-96)."""

from __future__ import annotations

import os
from typing import Callable, Optional, Type

from wisp_tpu.datasets.base_datasets import MultiviewDataset, SDFDataset, WispDataset


def _all_subclasses(cls):
    out = set()
    for sub in cls.__subclasses__():
        out.add(sub)
        out |= _all_subclasses(sub)
    return out


def _load_dataset(dataset_baseclass: Type[WispDataset], dataset_path: str,
                  dataset_num_workers: int = -1, transform: Optional[Callable] = None,
                  split: Optional[str] = None, **kwargs):
    root = os.path.abspath(os.path.expanduser(dataset_path))
    files_list = os.listdir(root) if os.path.isdir(root) else []
    matches = [sub for sub in _all_subclasses(dataset_baseclass)
               if sub.is_root_of_dataset(root, files_list)]
    if len(matches) > 1:
        raise RuntimeError(
            f"Multiple dataset formats match {root}: {[m.__name__ for m in matches]}; "
            f"construct the dataset explicitly.")
    if not matches:
        raise RuntimeError(f"No known dataset format matches the contents of {root}.")
    from wisp_tpu.config.utils import instantiate, configure
    cls = matches[0]
    import inspect
    sig = inspect.signature(cls.__init__)
    valid = set(sig.parameters) - {"self"}
    kw = {k: v for k, v in kwargs.items() if k in valid}
    return cls(dataset_path=dataset_path, dataset_num_workers=dataset_num_workers,
               transform=transform, split=split, **kw)


def load_multiview_dataset(dataset_path: str, dataset_num_workers: int = -1,
                           transform: Optional[Callable] = None,
                           split: Optional[str] = None, **kwargs) -> MultiviewDataset:
    """Load the MultiviewDataset subclass matching the files under dataset_path
    (format sniffing via is_root_of_dataset, reference utils.py:21-60)."""
    # ensure format classes are imported so subclass walk can find them
    from wisp_tpu.datasets.formats import nerf_standard  # noqa: F401
    try:
        from wisp_tpu.datasets.formats import rtmv  # noqa: F401
    except ImportError:
        pass
    return _load_dataset(MultiviewDataset, dataset_path, dataset_num_workers, transform,
                         split, **kwargs)


def load_sdf_dataset(dataset_path: str, **kwargs) -> SDFDataset:
    return _load_dataset(SDFDataset, dataset_path, **kwargs)


def host_device_ctx():
    """Context manager pinning jax ops to the host CPU backend (no-op if unavailable).

    Dataset assembly (camera construction, per-view raygen) is a chain of small eager ops;
    on the remote-TPU platform each eager dispatch costs a 1-6 s tunnel round trip, so a
    100-view load can burn minutes on ops whose outputs are host numpy arrays anyway.
    """
    import contextlib
    import jax
    try:
        return jax.default_device(jax.local_devices(backend="cpu")[0])
    except RuntimeError:
        return contextlib.nullcontext()
