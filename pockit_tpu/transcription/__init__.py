"""Transcription: lower a configured System into jitted JAX NLP functions."""

from pockit_tpu.transcription.compiled import CompiledSystem, compile_system

__all__ = ["CompiledSystem", "compile_system"]
