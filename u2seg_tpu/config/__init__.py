from u2seg_tpu.config.config import (
    Config,
    get_cfg,
    load_config,
    save_config,
    to_dict,
)

__all__ = ["Config", "get_cfg", "load_config", "save_config", "to_dict"]
