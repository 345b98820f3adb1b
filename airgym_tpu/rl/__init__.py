from airgym_tpu.rl import ppo, running_stats

__all__ = ["ppo", "running_stats"]
