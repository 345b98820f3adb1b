from airgym_tpu.control import px4

__all__ = ["px4"]
