from . import attention, decoder, embedding, encoders, prenet

__all__ = ["attention", "decoder", "embedding", "encoders", "prenet"]
