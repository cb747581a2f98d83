# coding=utf-8
"""centerclip-tpu: a TPU-native (JAX/XLA/Pallas) video-text retrieval
framework with the capabilities of CenterCLIP (SIGIR'22)."""

import jax as _jax

# Keep full Python tracebacks OUT of MLIR locations.  jax's persistent
# compilation cache strips debug info from the outer StableHLO before
# hashing, but a Mosaic (Pallas) kernel payload is a serialized module
# inside a custom_call backend_config string that the strip pass cannot
# reach — with full tracebacks on, every *line-number shift* in any file
# on the kernel's call stack (e.g. a docstring edit in models/clip.py)
# changes the payload and silently invalidates the cache for every
# program containing the kernel (measured: a 5-line docstring commit
# forced a full ~7 min encode recompile).  With this off, only edits to
# the kernel's own body file can change the key.  Must be set before the
# first trace and identically in every process sharing the cache dir,
# hence here at package import.
_jax.config.update("jax_include_full_tracebacks_in_locations", False)
