from .config import Config, load_config, parse_overrides
from .logging import enable_compile_cache, get_logger, seed_everything, setup_run_dir

__all__ = ["Config", "load_config", "parse_overrides", "get_logger", "seed_everything",
           "enable_compile_cache", "setup_run_dir"]
