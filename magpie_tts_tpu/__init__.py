"""magpie_tts_tpu — TPU-native Magpie TTS inference framework (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of m1el/magpie-tts.cpp for TPU:
text -> phonemes -> autoregressive audio codes -> 22050 Hz waveform, with the
whole decode loop compiled on device. See docs/DESIGN.md.
"""

from .config import CodecConfig, MagpieConfig
from .pipeline import MagpiePipeline
from .runtime.engine import CodecEngine, MagpieEngine
from .runtime.streaming import StreamParams, split_sentences
from .text.tokenizer import MagpieTokenizer

__version__ = "0.1.0"

__all__ = [
    "CodecConfig", "CodecEngine", "MagpieConfig", "MagpieEngine",
    "MagpiePipeline", "MagpieTokenizer", "StreamParams", "split_sentences",
]
