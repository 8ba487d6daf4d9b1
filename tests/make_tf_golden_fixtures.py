"""Cross-implementation golden fixtures from TensorFlow 2.21 (in-env).

The reference is TF1 graph code that cannot run here, but TF2's Keras
cells implement the SAME primitive math (LSTM cell, GRU cell, Conv1D +
BatchNormalization).  This script drives the Keras implementations with
fixed random weights, maps the weight layouts to ours, and stores
inputs/weights/outputs in ``tests/fixtures/tf_golden.npz``.
``tests/test_tf_goldens.py`` then pins ``ops/rnn.py``, ``ops/conv.py`` and
``models/attention.py`` against a SECOND INDEPENDENT implementation, the
way ``tests/test_audio_golden.py`` pins the DSP chain.

Gate-layout mapping (documented here because it IS the test):
* ours (ops/rnn.py ZoneoutLSTMCell, TF1 BasicLSTMCell layout):
  one kernel (in+units, 4U), gate column order [i | g | f | o],
  forget_bias=1.0 added IN MATH (reference: @tacotron2 ZoneoutLSTMCell).
  Keras LSTMCell: kernel (in, 4U) + recurrent_kernel (units, 4U), order
  [i | f | c | o], no in-math forget bias -> keras f-bias = ours + 1.0.
* ours GRUCell (TF1 GRUCell layout): gates kernel (in+units, 2U) order
  [r | u] (bias init 1.0), candidate kernel (in+units, U).
  Keras GRUCell(reset_after=False): kernels order [z | r | h], z == our u.
* Conv1D 'same' + BatchNormalization(momentum .99, eps 1e-3): identical
  kernel layout (k, in, out); training=True batch statistics + moving
  updates, and inference with given moving statistics.
* Bahdanau energy: v . tanh(W_k(memory) + W_q(query)) with -inf length
  masking and softmax (reference: TF BahdanauAttention used at
  modules/attentions.py:15-62).

Run: python tests/make_tf_golden_fixtures.py  (rewrites the .npz)
"""

import os

import numpy as np

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "tf_golden.npz")

B, T, IN, U = 3, 6, 5, 7          # lstm/gru shapes
CT, CIN, CK, COUT = 9, 4, 3, 8    # conv shapes
AT, AC, AQ, AU = 8, 6, 5, 7       # attention shapes (T_mem, C_mem, A, units)


def main():
    import tensorflow as tf

    rng = np.random.RandomState(20260821)
    out = {}

    # ------------------------------------------------------------- LSTM cell
    kernel = rng.randn(IN + U, 4 * U).astype(np.float32) * 0.4   # [i|g|f|o]
    bias = rng.randn(4 * U).astype(np.float32) * 0.1
    xs = rng.randn(T, B, IN).astype(np.float32)

    cell = tf.keras.layers.LSTMCell(U)
    cell.build((B, IN))
    i, g, f, o = np.split(kernel, 4, axis=1)
    bi, bg, bf, bo = np.split(bias, 4)
    keras_k = np.concatenate([i[:IN], f[:IN], g[:IN], o[:IN]], axis=1)
    keras_rk = np.concatenate([i[IN:], f[IN:], g[IN:], o[IN:]], axis=1)
    keras_b = np.concatenate([bi, bf + 1.0, bg, bo])  # forget bias in math
    cell.set_weights([keras_k, keras_rk, keras_b])

    h = tf.zeros((B, U))
    c = tf.zeros((B, U))
    hs = []
    for t in range(T):
        _, (h, c) = cell(tf.constant(xs[t]), [h, c])
        hs.append(h.numpy())
    out.update(lstm_kernel=kernel, lstm_bias=bias, lstm_xs=xs,
               lstm_hs=np.stack(hs), lstm_c=c.numpy())

    # -------------------------------------------------------------- GRU cell
    gk = rng.randn(IN + U, 2 * U).astype(np.float32) * 0.4      # [r|u]
    gb = rng.randn(2 * U).astype(np.float32) * 0.1 + 1.0
    ck = rng.randn(IN + U, U).astype(np.float32) * 0.4
    cb = rng.randn(U).astype(np.float32) * 0.1
    gxs = rng.randn(T, B, IN).astype(np.float32)

    gcell = tf.keras.layers.GRUCell(U, reset_after=False)
    gcell.build((B, IN))
    r, u = np.split(gk, 2, axis=1)
    br, bu = np.split(gb, 2)
    keras_k = np.concatenate([u[:IN], r[:IN], ck[:IN]], axis=1)   # [z|r|h]
    keras_rk = np.concatenate([u[IN:], r[IN:], ck[IN:]], axis=1)
    keras_b = np.concatenate([bu, br, cb])
    gcell.set_weights([keras_k, keras_rk, keras_b])

    gh = tf.zeros((B, U))
    ghs = []
    for t in range(T):
        gh, _ = gcell(tf.constant(gxs[t]), [gh])
        ghs.append(gh.numpy())
    out.update(gru_gate_kernel=gk, gru_gate_bias=gb, gru_cand_kernel=ck,
               gru_cand_bias=cb, gru_xs=gxs, gru_hs=np.stack(ghs))

    # ----------------------------------------------------- Conv1D + BatchNorm
    conv_k = rng.randn(CK, CIN, COUT).astype(np.float32) * 0.4
    cxs = rng.randn(B, CT, CIN).astype(np.float32)
    gamma = (1.0 + 0.2 * rng.randn(COUT)).astype(np.float32)
    beta = (0.1 * rng.randn(COUT)).astype(np.float32)
    mov_mean = (0.3 * rng.randn(COUT)).astype(np.float32)
    mov_var = (1.0 + 0.2 * rng.rand(COUT)).astype(np.float32)

    conv = tf.keras.layers.Conv1D(COUT, CK, padding="same", use_bias=False)
    conv.build((B, CT, CIN))
    conv.set_weights([conv_k])
    bn = tf.keras.layers.BatchNormalization(momentum=0.99, epsilon=1e-3)
    bn.build((B, CT, COUT))
    bn.set_weights([gamma, beta, mov_mean, mov_var])

    conv_out = conv(tf.constant(cxs))
    train_out = bn(conv_out, training=True)
    new_mean, new_var = bn.moving_mean.numpy(), bn.moving_variance.numpy()
    # rebuild for a clean inference pass with the ORIGINAL moving stats
    bn.set_weights([gamma, beta, mov_mean, mov_var])
    infer_out = bn(conv_out, training=False)
    out.update(conv_kernel=conv_k, conv_xs=cxs, bn_gamma=gamma, bn_beta=beta,
               bn_mov_mean=mov_mean, bn_mov_var=mov_var,
               convbn_train_out=train_out.numpy(),
               convbn_new_mean=new_mean, convbn_new_var=new_var,
               convbn_infer_out=infer_out.numpy())

    # ------------------------------------------------------- Bahdanau energy
    memory = rng.randn(B, AT, AC).astype(np.float32) * 0.7
    query = rng.randn(B, AQ).astype(np.float32) * 0.7
    w_k = rng.randn(AC, AU).astype(np.float32) * 0.4
    w_q = rng.randn(AQ, AU).astype(np.float32) * 0.4
    v = rng.randn(AU).astype(np.float32) * 0.4
    lengths = np.array([AT, AT - 2, AT - 5], np.int32)

    keys = tf.linalg.matmul(tf.constant(memory), tf.constant(w_k))
    pq = tf.linalg.matmul(tf.constant(query), tf.constant(w_q))[:, None, :]
    energy = tf.reduce_sum(tf.constant(v) * tf.tanh(keys + pq), axis=-1)
    mask = tf.sequence_mask(lengths, AT)
    masked = tf.where(mask, energy, tf.fill(tf.shape(energy), -np.inf))
    probs = tf.nn.softmax(masked, axis=-1)
    out.update(bah_memory=memory, bah_query=query, bah_wk=w_k, bah_wq=w_q,
               bah_v=v, bah_lengths=lengths, bah_probs=probs.numpy())

    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez(FIXTURE, **out)
    print(f"wrote {FIXTURE}: {sorted(out)}")


if __name__ == "__main__":
    main()
