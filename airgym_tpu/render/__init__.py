from airgym_tpu.render import depth

__all__ = ["depth"]
