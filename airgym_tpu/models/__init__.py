from airgym_tpu.models import actor_critic

__all__ = ["actor_critic"]
