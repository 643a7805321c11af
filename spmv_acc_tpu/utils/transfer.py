"""Chunked host->device transfers for tunneled backends.

The axon TPU tunnel ships device_put payloads as single HTTP requests and
rejects very large bodies (observed: HTTP 413 at ~820MB uploading a zoo
row-pack).  ``asarray_chunked`` splits big host arrays into row-block
transfers and concatenates on device — same result, bounded request size.
On direct-attached backends jnp.asarray is used unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["asarray_chunked"]

# Safe per-request payload for the tunnel (its limit was hit at ~820MB).
_MAX_BYTES = 128 << 20


def asarray_chunked(a: np.ndarray, max_bytes: int = _MAX_BYTES):
    """jnp.asarray for big host arrays, transferred in <= max_bytes chunks
    along axis 0."""
    a = np.asarray(a)
    if a.nbytes <= max_bytes or a.ndim == 0 or a.shape[0] <= 1:
        return jnp.asarray(a)
    rows_per = max(1, int(max_bytes // max(1, a.nbytes // a.shape[0])))
    parts = [jnp.asarray(a[i : i + rows_per]) for i in range(0, a.shape[0], rows_per)]
    if len(parts) == 1:
        return parts[0]
    out = jnp.concatenate(parts, axis=0)
    # free the staged parts eagerly (concatenate already materialized `out`)
    for p in parts:
        p.delete()
    return out
