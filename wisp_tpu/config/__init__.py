from wisp_tpu.config.utils import (
    autoconfig, configure, instantiate, parse_config, print_config,
    write_config_to_yaml, get_config_target, config_to_dict,
)
from wisp_tpu.config.presets import (
    ConfigAdam, ConfigAdamW, ConfigRMSprop, ConfigSGD, ConfigDataloader,
)
