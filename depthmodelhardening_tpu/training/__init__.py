from .config import SelfSupConfig, HardeningConfig, DistillConfig  # noqa: F401
