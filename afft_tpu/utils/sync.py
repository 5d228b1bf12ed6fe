"""Device synchronization that actually waits on this TPU platform.

``block_until_ready()`` returns WITHOUT waiting on the tunneled 'axon'
backend, so every timing window / completion barrier must force a real
device->host readback. Device execution is in-order, so draining the last
dispatched program drains everything before it. bf16 readbacks abort the
backend, hence the fp32 cast of a tiny slice.
"""

from __future__ import annotations

import numpy as np


def force_device_sync(x) -> None:
    """Barrier on the device queue up to (and including) the program that
    produced ``x``. Cheap: reads back 8 fp32 scalars."""
    import jax.numpy as jnp
    np.asarray(jnp.ravel(x)[:8].astype(jnp.float32))
