"""Fused nearest-neighbor lookup (the shared quantizer-assignment op).

One op serves three reference call sites (SURVEY.md §2.4):
  - k-means assignment: torch.cdist + argmin (encoder.py:100-103)
  - vector-quantize-pytorch lookup (encoder.py:180)
  - RVQ per-codebook search (via nn/rvq.py, same distance form)

Distance is the fused ||x||^2 - 2 x.C^T + ||c||^2 expansion — identical to
torch.cdist's matmul path — with first-min tie-breaking, so ids match the
reference bit-for-bit in f32.
"""

import jax
import jax.numpy as jnp


def nearest_centroid(
    x: jnp.ndarray,
    centroids: jnp.ndarray,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """x [..., D], centroids [C, D] -> indices [...] int32."""
    x = x.astype(jnp.float32)
    c = centroids.astype(jnp.float32)
    x2 = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    xc = jnp.einsum(
        "...d,cd->...c", x, c, precision=precision,
        preferred_element_type=jnp.float32,
    )
    c2 = jnp.sum(jnp.square(c), axis=-1)
    # argmax of the negated distance == first-occurrence argmin, matching
    # torch.argmin / dist.max(-1).indices tie-breaking.
    return jnp.argmax(-(x2 - 2.0 * xc + c2), axis=-1)
