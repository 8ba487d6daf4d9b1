"""Embedding tables.

Parity targets:
* ``Embedding(num_symbols, embedding_dim, index_offset)`` — @tacotron2
  (reference call sites: models/models.py:28-46): a lookup table where ids
  are shifted down by ``index_offset`` before lookup (the accent-type ids
  arrive as raw code points offset by 0x3100, reference: hparams.py:58).
* ``ExternalEmbedding`` — multi_speaker_tacotron
  (reference: models/models.py:48-50): speaker embeddings loaded from a file
  and kept frozen.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

glorot = nn.initializers.glorot_uniform()


class Embedding(nn.Module):
    num_symbols: int
    embedding_dim: int
    index_offset: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids):
        table = self.param("embedding", glorot,
                           (self.num_symbols, self.embedding_dim), jnp.float32)
        idx = jnp.clip(ids - self.index_offset, 0, self.num_symbols - 1)
        return jnp.take(table, idx, axis=0).astype(self.dtype)


def load_external_embedding(path: str) -> np.ndarray:
    """Load a (num_speakers, dim) embedding matrix from .npy/.npz/.txt."""
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    if path.endswith(".npz"):
        data = np.load(path)
        return data[list(data.keys())[0]].astype(np.float32)
    return np.loadtxt(path, dtype=np.float32)


class ExternalEmbedding(nn.Module):
    """File-backed, non-trainable embedding (stored as a 'constants'
    collection so it is excluded from gradients and the optimizer)."""

    embedding_file: str
    num_speakers: int
    embedding_dim: int
    index_offset: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids):
        def init(_key):
            table = load_external_embedding(self.embedding_file)
            assert table.shape == (self.num_speakers, self.embedding_dim), (
                f"external embedding shape {table.shape} != "
                f"({self.num_speakers}, {self.embedding_dim})")
            return jnp.asarray(table)
        table = self.variable("constants", "embedding", init,
                              jax.random.PRNGKey(0)).value
        idx = jnp.clip(ids - self.index_offset, 0, self.num_speakers - 1)
        return jnp.take(table, idx, axis=0).astype(self.dtype)
