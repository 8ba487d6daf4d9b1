from . import attention, decoder, embedding, encoders, postnet, prenet, tacotron
from .decoder import DecoderMode, TacotronDecoder
from .tacotron import (Batch, DualSourceSelfAttentionMgcLf0TacotronModel,
                       DualSourceSelfAttentionTacotronModel,
                       ExtendedTacotronV1Model, TacotronModel, TacotronOutput,
                       compute_loss, tacotron_model_factory)

__all__ = [
    "attention", "decoder", "embedding", "encoders", "postnet", "prenet",
    "tacotron", "DecoderMode", "TacotronDecoder", "Batch", "TacotronModel",
    "TacotronOutput", "compute_loss", "tacotron_model_factory",
    "DualSourceSelfAttentionTacotronModel", "ExtendedTacotronV1Model",
    "DualSourceSelfAttentionMgcLf0TacotronModel",
]
