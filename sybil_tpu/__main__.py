import os

# The ambient axon TPU plugin overrides JAX_PLATFORMS at import time, so
# honoring the env var needs the config set before any backend init (a
# second process cannot share the tunneled TPU anyway).
if os.environ.get("JAX_PLATFORMS"):
    try:
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:  # noqa: BLE001 - CLI must still work without jax
        pass

from .cli import main

if __name__ == "__main__":
    import sys
    try:
        sys.exit(main())
    except BrokenPipeError:
        # stdout reader (head, less) went away: exit quietly like a
        # SIGPIPE'd unix tool
        try:
            sys.stdout.close()
        except Exception:  # noqa: BLE001
            pass
        sys.exit(0)
