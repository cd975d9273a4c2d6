from action_segmentation_tpu.utils.logger import logger, path_logger
from action_segmentation_tpu.utils.misc import (
    all_equal,
    enable_compilation_cache,
    load_pickle,
    nested_dict_map,
)

__all__ = [
    "logger",
    "path_logger",
    "all_equal",
    "enable_compilation_cache",
    "nested_dict_map",
    "load_pickle",
]
