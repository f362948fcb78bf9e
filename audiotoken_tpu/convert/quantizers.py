"""Semantic quantizer artifact converters.

  - sklearn k-means joblib (the mhubert L11 km1000 artifact the reference
    loads at /root/reference/audiotoken/encoder.py:83-85) -> centroid matrix
  - vector-quantize-pytorch VectorQuantize state dict (the w2vbert L19 C2048
    artifact, encoder.py:146-161) -> codebook matrix
"""

import numpy as np


def convert_kmeans(path_or_obj) -> np.ndarray:
    """joblib k-means artifact -> centroids [n_clusters, dim] float32."""
    if isinstance(path_or_obj, (str, bytes)):
        import joblib

        km = joblib.load(path_or_obj)
    else:
        km = path_or_obj
    return np.asarray(km.cluster_centers_, dtype=np.float32)


def convert_vq(state_dict) -> np.ndarray:
    """VectorQuantize state dict -> codebook [codebook_size, dim] float32.

    Handles the `_codebook.embed` key (with or without the leading heads
    dim) across vector-quantize-pytorch versions.
    """
    for key in ("_codebook.embed", "codebook.embed", "embed"):
        if key in state_dict:
            embed = state_dict[key]
            break
    else:
        raise KeyError(
            f"no codebook key in VQ state dict; keys: {list(state_dict)[:10]}"
        )
    if hasattr(embed, "detach"):
        embed = embed.detach().cpu().numpy()
    embed = np.asarray(embed, dtype=np.float32)
    if embed.ndim == 3:  # [heads, C, D]
        embed = embed[0]
    return embed
