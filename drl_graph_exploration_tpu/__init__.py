"""TPU-native active-SLAM graph-exploration framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
RobustFieldAutonomyLab/DRL_graph_exploration (IROS 2020): a batched 2D
active-SLAM simulator, graph observation extraction, macro-action reward
engine, GNN policies (GCN / GG-NN / g-U-Net) and DQN / A2C trainers — all as
one XLA program over a (B, ...) batch of worlds.
"""

__version__ = "0.1.0"
