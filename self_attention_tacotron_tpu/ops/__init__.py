from . import rnn, conv, attention_core, losses, stft

__all__ = ["rnn", "conv", "attention_core", "losses", "stft"]
