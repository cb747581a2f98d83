# coding=utf-8
"""centerclip-tpu: a TPU-native (JAX/XLA/Pallas) video-text retrieval
framework with the capabilities of CenterCLIP (SIGIR'22)."""

__version__ = "0.1.0"
