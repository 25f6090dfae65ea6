"""JAX platform selection helper.

This environment's jax build ignores the JAX_PLATFORMS env var (a TPU
plugin pins itself); jax.config.update("jax_platforms", ...) is the only
effective control. CLIs call apply_env() at startup so the conventional
env var works as users expect.
"""

from __future__ import annotations

import os


def apply_env():
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        import jax

        try:
            jax.config.update("jax_platforms", platforms)
        except Exception:  # already initialized: leave as-is
            pass
