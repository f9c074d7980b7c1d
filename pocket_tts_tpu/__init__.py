"""pocket-tts-tpu: a TPU-native (JAX/XLA/Pallas) rebuild of Pocket TTS inference.

Reference capability source: Codes4Fun/pocket-tts.cpp (C++/ggml), re-designed
TPU-first: pure-functional streaming state, one fused jitted step per 80 ms
frame, on-device PRNG/EOS, vmap batching and GSPMD sharding for serving.
"""
from .config import ModelConfig, DEFAULT_CONFIG, tiny_config

__version__ = "0.1.0"
