from airgym_tpu.physics import quadrotor

__all__ = ["quadrotor"]
