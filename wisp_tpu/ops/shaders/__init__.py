from wisp_tpu.ops.shaders.matcap import matcap_sampler, matcap_shader
from wisp_tpu.ops.shaders.shadow_rays import pointlight_shadow_shader
