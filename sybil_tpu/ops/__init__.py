"""Device kernels.

int64 lanes everywhere (column values are int64, ids are widened), so x64
must be enabled before any tracing happens; importing this package does it.
"""

import jax

jax.config.update("jax_enable_x64", True)
