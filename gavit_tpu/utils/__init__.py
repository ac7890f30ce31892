from gavit_tpu.utils.metrics import MetricCalculator  # noqa: F401
from gavit_tpu.utils.custom_logging import (  # noqa: F401
    setup_logging,
    log_system_info,
    log_dataset_info,
)
