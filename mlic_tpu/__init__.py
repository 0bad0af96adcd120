"""MLIC-TPU: TPU-native learned image compression (MLIC++ capabilities).

Importing the package enables JAX's persistent compilation cache so the
many per-shape codec/step executables compile once per machine, not once
per process.
"""

import os as _os

import jax as _jax

_cache_dir = _os.environ.get(
    "MLIC_TPU_XLA_CACHE", _os.path.expanduser("~/.cache/mlic_tpu_xla"))
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass
