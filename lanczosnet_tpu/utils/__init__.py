from lanczosnet_tpu.utils.config import (  # noqa: F401
    AttrDict,
    load_config,
    save_config,
    parse_arguments,
)
from lanczosnet_tpu.utils.logger import setup_logging, get_logger, MetricsLogger  # noqa: F401
