from wisp_tpu.core.module import Module, module_leaves_with_paths
from wisp_tpu.core.rays import Rays
from wisp_tpu.core.render_buffer import RenderBuffer
from wisp_tpu.core.channels import Channel, channels_starter_kit, create_default_channel
from wisp_tpu.core.primitives import PrimitivesPack
from wisp_tpu.core.transforms import ObjectTransform
from wisp_tpu.core import channel_fn, colors
from wisp_tpu.core.camera import Camera
