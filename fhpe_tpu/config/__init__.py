from .node import CfgNode, FrozenError
from .defaults import get_default_config, load_config, MODEL_EXTRAS

__all__ = ["CfgNode", "FrozenError", "get_default_config", "load_config", "MODEL_EXTRAS"]
