"""Shared tensorflow_addons stub for running the TF reference here.

tensorflow_addons is not installed in this image; the reference
(transfer_em/cgan.py:78-81) needs ``tfa.losses.SigmoidFocalCrossEntropy``.
This module recreates it with the identical formula (tfa's documented
sigmoid focal CE) so bench.py's TF baseline and the train-step golden test
(tests/test_tf_parity.py) agree on one definition.

Usage:
    import tfa_stub
    tfa_stub.install()          # registers sys.modules entries
    # ... import transfer_em.cgan ...
"""

import sys
import types


def build():
    """Return (tfa_module, tfa_losses_module); requires tensorflow."""
    import tensorflow as tf

    tfa = types.ModuleType("tensorflow_addons")
    tfa_losses = types.ModuleType("tensorflow_addons.losses")

    class SigmoidFocalCrossEntropy(tf.keras.losses.Loss):
        def __init__(self, from_logits=False, alpha=0.25, gamma=2.0,
                     reduction="sum_over_batch_size", **kw):
            # Keras 3 dropped Reduction.AUTO; it meant SUM_OVER_BATCH_SIZE.
            if str(reduction).lower() == "auto":
                reduction = "sum_over_batch_size"
            super().__init__(reduction=reduction)
            self.from_logits = from_logits
            self.alpha = alpha
            self.gamma = gamma

        def call(self, y_true, y_pred):
            y_true = tf.cast(y_true, tf.float32)
            ce = tf.keras.backend.binary_crossentropy(
                y_true, y_pred, from_logits=self.from_logits)
            p = tf.sigmoid(y_pred) if self.from_logits else y_pred
            p_t = y_true * p + (1 - y_true) * (1 - p)
            alpha_t = y_true * self.alpha + (1 - y_true) * (1 - self.alpha)
            return tf.reduce_sum(
                alpha_t * tf.pow(1 - p_t, self.gamma) * ce, axis=-1)

    tfa_losses.SigmoidFocalCrossEntropy = SigmoidFocalCrossEntropy
    tfa.losses = tfa_losses
    return tfa, tfa_losses


def install():
    """Install the stub into sys.modules (idempotent; no-op if real tfa
    is importable)."""
    if "tensorflow_addons" in sys.modules:
        return
    try:
        import tensorflow_addons  # noqa: F401  (real one present)
        return
    except ImportError:
        pass
    tfa, tfa_losses = build()
    sys.modules["tensorflow_addons"] = tfa
    sys.modules["tensorflow_addons.losses"] = tfa_losses
