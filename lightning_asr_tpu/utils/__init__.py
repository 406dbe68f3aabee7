from .config import Config, load_config, parse_overrides
from .logging import enable_compile_cache, get_logger, seed_everything

__all__ = ["Config", "load_config", "parse_overrides", "get_logger", "seed_everything", "enable_compile_cache"]
