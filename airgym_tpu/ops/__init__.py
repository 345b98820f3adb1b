from airgym_tpu.ops import transcendental

__all__ = ["transcendental"]
