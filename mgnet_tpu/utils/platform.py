"""Backend-selection helper for CLI entry points.

This container's site customization registers and force-selects the
tunneled TPU backend regardless of the JAX_PLATFORMS environment
variable; programs that should honor an explicit ``JAX_PLATFORMS=cpu``
(CI, the pipeline smoke test, multi-process localhost runs) must ALSO
set the config flag before any backend is touched. Every CLI calls this
first thing in ``main``.
"""

from __future__ import annotations

import os

__all__ = ["apply_platform_env"]


def apply_platform_env() -> None:
    """Make jax honor the JAX_PLATFORMS environment variable."""
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats:
        import jax

        jax.config.update("jax_platforms", plats)
