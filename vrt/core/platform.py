"""Platform selection helper.

The environment's TPU sitecustomize can pin the JAX platform at interpreter
start, silently overriding the standard ``JAX_PLATFORMS`` env var.  CLIs
call :func:`apply_platform_env` first thing in ``main()`` to restore env-var
semantics (effective as long as no backend has initialized yet).
Programmatic users who need a specific platform should call
``jax.config.update("jax_platforms", ...)`` themselves before first use.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass
