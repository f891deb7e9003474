"""Batch containers (reference wisp/datasets/batch.py:17-115): attribute-dict style batches
passed from datasets to trainers. Implemented as plain dicts with attribute access; values are
host numpy arrays (device transfer happens at the jit boundary) or Rays."""

from __future__ import annotations


class Batch(dict):
    """AttrDict-style batch: b.rays, b['rays'] interchangeable."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value


class MultiviewBatch(Batch):
    """Multiview training batch: rays + per-ray supervision channels
    (reference batch.py:44-83). Canonical keys: rays, rgb, masks, depth."""

    def ray_values(self):
        return {k: v for k, v in self.items() if k != "rays"}


class SDFBatch(Batch):
    """SDF training batch (reference batch.py:86-115). Canonical keys: coords, sdf, rgb,
    normals."""
