"""Platform selection helper.

This image's sitecustomize preimports jax and overwrites JAX_PLATFORMS with
the TPU plugin, so shell-level ``JAX_PLATFORMS=cpu`` never reaches jax.
``ensure_platform()`` honours ``GLT_PLATFORM`` (cpu|tpu|axon|"") via
jax.config before any backend is initialised.  Call it first thing in
scripts/examples.
"""

from __future__ import annotations

import os


def ensure_platform(default: str | None = None) -> str:
    import jax

    want = os.environ.get("GLT_PLATFORM", default or "")
    if want:
        if want == "tpu":
            want = os.environ.get("JAX_PLATFORMS", "") or "axon"
        jax.config.update("jax_platforms", want)
    enable_compile_cache()
    return jax.default_backend()


def enable_compile_cache(path: str | None = None):
    """Persistent XLA compile cache — remote TPU compiles here are slow
    (minutes, high variance), so cache hits across runs matter a lot."""
    import jax

    path = path or os.environ.get(
        "GLT_COMPILE_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
