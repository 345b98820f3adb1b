"""airgym_tpu — a TPU-native (JAX/XLA/Pallas) quadrotor deep-RL framework.

From-scratch re-design of emNavi/AirGym's capabilities for TPU: batched
6-DoF quadrotor physics, a PX4-aligned flight-control cascade, five RL tasks
(Hovering, Balloon, Tracking, Avoid, Planning) plus the multi-agent
MAPlanning demo and the DepthGen dataset generator, a Pallas depth-camera
renderer, and a fully-jitted PPO trainer — everything on-device, sharded
over a TPU mesh along the env axis.
"""

__version__ = "0.1.0"
