"""whisper_tpu: TPU-native Whisper speech-to-text framework.

See docs/ARCHITECTURE.md for the design and SURVEY.md for the reference
(szuwgh/whisper.rs) capability contract this implements.
"""

__version__ = "0.1.0"


def load_model(path, **kwargs):
    """Load a GGML Whisper checkpoint (see model.load.load_model)."""
    from .model.load import load_model as _load

    return _load(path, **kwargs)


def transcribe(model, audio, **kwargs):
    """Transcribe audio with a loaded model (see pipeline.transcribe)."""
    from .pipeline.transcribe import transcribe as _transcribe

    return _transcribe(model, audio, **kwargs)


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Persistent XLA compilation cache — large-model decode loops take
    minutes to compile; cached reloads take seconds."""
    import os

    import jax

    if cache_dir is None:
        cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)