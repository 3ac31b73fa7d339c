"""orbslam2_tpu — a TPU-native visual SLAM engine.

A from-scratch re-design of the capabilities of ORB-SLAM2 (reference:
YHY138/ORB-SLAM2-, an annotated fork of Mur-Artal's ORB-SLAM2) as
JAX/XLA/Pallas device programs orchestrated by a host-side functional
pipeline: FAST+oriented-BRIEF extraction over an image pyramid, BoW place
recognition, Hamming descriptor matching, PnP/essential-matrix tracking,
batched Schur-complement bundle adjustment, and Sim(3) loop closure with
pose-graph optimization.
"""
from .config import Sensor, SlamConfig, OrbParams, load_settings  # noqa: F401
from .system import System  # noqa: F401

__version__ = "0.1.0"
