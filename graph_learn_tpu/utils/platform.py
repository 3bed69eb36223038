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
    return jax.default_backend()
