from airgym_tpu.math import rotations

__all__ = ["rotations"]
