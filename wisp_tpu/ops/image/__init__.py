from wisp_tpu.ops.image.io import write_png, write_exr, load_rgb, hwc_to_chw, chw_to_hwc
from wisp_tpu.ops.image.metrics import psnr, ssim, lpips
from wisp_tpu.ops.image.processing import srgb_to_linear, linear_to_srgb, resize_mip
from wisp_tpu.ops.image.exr import read_exr, write_exr as write_exr_planes, read_exr_rgbd
