import jax
import jax.numpy as jnp
import numpy as np

from self_attention_tacotron_tpu.ops.losses import (
    binary_loss, classification_loss, global_norm_clip, l2_regularization_loss,
    noam_learning_rate, spec_loss,
)


def test_spec_loss_masked_mean():
    out = jnp.ones((1, 4, 2))
    tgt = jnp.zeros((1, 4, 2))
    mask = jnp.array([[1.0, 1.0, 0.0, 0.0]])
    # |1-0| over 2 valid frames x 2 channels / (2 * 2) = 1.0
    assert float(spec_loss(out, tgt, mask, "l1")) == 1.0
    assert float(spec_loss(2 * out, tgt, mask, "mse")) == 4.0
    # padding region must not contribute
    out2 = out.at[:, 2:].set(100.0)
    assert float(spec_loss(out2, tgt, mask, "l1")) == 1.0


def test_binary_loss_matches_formula():
    logits = jnp.array([[0.0, 2.0, -1.0]])
    done = jnp.array([[0.0, 1.0, 1.0]])
    mask = jnp.array([[1.0, 1.0, 0.0]])
    expected = (np.log(2.0) + (np.maximum(2, 0) - 2 * 1 + np.log1p(np.exp(-2)))) / 2
    np.testing.assert_allclose(float(binary_loss(logits, done, mask)),
                               expected, rtol=1e-6)


def test_classification_loss():
    logits = jnp.array([[[10.0, 0.0], [0.0, 10.0]]])
    onehot = jnp.array([[[1.0, 0.0], [1.0, 0.0]]])
    mask = jnp.ones((1, 2))
    val = float(classification_loss(logits, onehot, mask))
    assert 4.9 < val < 5.1  # (~0 + ~10)/2


def test_l2_blacklist():
    params = {"dense": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
              "embedding": {"kernel": jnp.ones((3, 3))}}
    loss = l2_regularization_loss(params, 1.0, ["bias", "embedding"])
    assert float(loss) == 0.5 * 4  # only dense/kernel
    loss_all = l2_regularization_loss(params, 2.0, [])
    assert float(loss_all) == 2.0 * 0.5 * (4 + 2 + 9)


def test_global_norm_clip():
    grads = {"a": jnp.array([3.0]), "b": jnp.array([4.0])}  # norm 5
    clipped, norm = global_norm_clip(grads, 1.0)
    assert float(norm) == 5.0
    total = np.sqrt(sum(float(jnp.sum(v ** 2)) for v in clipped.values()))
    np.testing.assert_allclose(total, 1.0, rtol=1e-6)
    # below the cap: unchanged
    small = {"a": jnp.array([0.3]), "b": jnp.array([0.4])}
    c2, _ = global_norm_clip(small, 1.0)
    np.testing.assert_allclose(float(c2["a"][0]), 0.3, rtol=1e-6)


def test_noam_learning_rate_schedule():
    # reference: models/models.py:283-287
    lr0 = float(noam_learning_rate(0.002, jnp.asarray(0)))
    np.testing.assert_allclose(lr0, 0.002 * 4000 ** 0.5 * 1 * 4000 ** -1.5, rtol=1e-6)
    lr_peak = float(noam_learning_rate(0.002, jnp.asarray(3999)))
    np.testing.assert_allclose(lr_peak, 0.002, rtol=1e-3)
    lr_decay = float(noam_learning_rate(0.002, jnp.asarray(16000 - 1)))
    np.testing.assert_allclose(lr_decay, 0.001, rtol=1e-3)
