"""alphazero_tpu — a TPU-native AlphaZero framework.

A from-scratch re-design of the capabilities of AlphaZero.jl
(jonathan-laurent/AlphaZero.jl, mounted read-only at /root/reference) for
TPU hardware: pure-functional vectorized game environments, fully batched
array MCTS, a device-resident replay buffer and a jitted actor-learner loop,
sharded over device meshes with GSPMD.
"""

__version__ = "0.1.0"
