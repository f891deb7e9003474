"""wisp_tpu — a TPU-native neural fields framework (JAX / XLA / Pallas).

A ground-up rebuild of the capabilities of NVIDIAGameWorks/kaolin-wisp for TPU hardware:
sparse morton-coded octree acceleration structures, a feature-grid zoo (hash / octree /
triplanar / codebook), differentiable packed ray tracers re-expressed as fixed-shape masked
XLA programs, neural-field models with channel-based forward dispatch, trainers, datasets,
typed config system, and data-parallel scale-out over device meshes.

Public API mirrors the reference's import surface: core datastructs at the top level,
subsystems as submodules.
"""

__version__ = "0.1.0"

from wisp_tpu.core import (Rays, RenderBuffer, Camera, Channel, channels_starter_kit,
                           PrimitivesPack, ObjectTransform, Module)
from wisp_tpu.framework.state import WispState
