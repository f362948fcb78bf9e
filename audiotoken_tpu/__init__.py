"""audiotoken_tpu — TPU-native audio tokenization framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of cmeraki/audiotoken
(reference: /root/reference/audiotoken/__init__.py:1-12): convert audio into
discrete acoustic tokens (EnCodec-style residual-VQ codes) or semantic tokens
(HuBERT + k-means, wav2vec2-BERT + VQ), and decode tokens back to waveforms.

Public surface mirrors the reference package exports
(reference __init__.py:1-3): ``AudioToken``, ``Tokenizers``, ``read_audio``.

Unlike the reference, importing this package performs NO network access and
NO global mutation of numerics flags; precision policy is explicit
(see runtime/precision.py).
"""

from .configs import Tokenizers, AUDIO_EXTS, TAR_EXTS, ZIP_EXTS
from .api import AudioToken
from .io.audio import read_audio

__version__ = "0.1.0"

__all__ = [
    "AudioToken",
    "Tokenizers",
    "read_audio",
    "AUDIO_EXTS",
    "TAR_EXTS",
    "ZIP_EXTS",
    "__version__",
]
