from fastvideo_tpu.models.audio.ltx2_audio_vae import (  # noqa: F401
    AudioDecoder, AudioEncoder, Vocoder)
