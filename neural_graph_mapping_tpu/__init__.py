"""TPU-native neural graph mapping: dense SLAM mapping with per-keyframe
neural fields, rebuilt for JAX/XLA/Pallas from the capabilities of
KTH-RPL/neural_graph_mapping (reference mounted at /root/reference)."""

__version__ = "0.1.0"
