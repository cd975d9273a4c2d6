from action_segmentation_tpu.utils.logger import logger, path_logger
from action_segmentation_tpu.utils.misc import all_equal, nested_dict_map, load_pickle

__all__ = ["logger", "path_logger", "all_equal", "nested_dict_map", "load_pickle"]
