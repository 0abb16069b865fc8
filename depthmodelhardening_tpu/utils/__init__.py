from .logging import MetricsLogger, sec_to_hm_str  # noqa: F401
from .profiling import StepTimer, trace  # noqa: F401
