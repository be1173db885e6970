"""chatterbox_embed_tpu: a TPU-native (JAX/XLA/Pallas) rebuild of the
Chatterbox zero-shot TTS production pipeline (chrijaque/chatterbox_embed).

Public API mirrors the reference:
    ChatterboxTTS.from_pretrained / from_local / generate / generate_long_text
    ChatterboxVC.generate / create_voice_clone
    save_voice_clone / save_voice_profile (.npy formats preserved)
"""

__version__ = "0.1.0"

from .config import (S3_SR, S3GEN_SR, S3_TOKEN_RATE, SPEECH_VOCAB_SIZE,
                     ChatterboxConfig, T3Config, S3GenConfig, VoiceEncConfig)


def __getattr__(name):
    # Lazy imports keep `import chatterbox_embed_tpu` light (no jax trace work).
    if name == "ChatterboxTTS":
        from .tts import ChatterboxTTS
        return ChatterboxTTS
    if name == "ChatterboxVC":
        from .vc import ChatterboxVC
        return ChatterboxVC
    raise AttributeError(name)
