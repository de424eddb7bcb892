"""Train the SmallCNN classifier (Grad-CAM target / feature extractor).

The reference leans on *downloaded* pretrained classifiers for analysis; in
a zero-egress environment the classifier is trained in-framework — a few
epochs on the X-ray folder tree (or synthetic data) suffices for CAM and
projection features.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from superdiff_tpu.analysis.features import SmallCNN


def train_classifier(batches: Iterable, num_classes: int = 2,
                     num_steps: int = 200, learning_rate: float = 1e-3,
                     seed: int = 0) -> Tuple[SmallCNN, dict, dict]:
    """Train on an iterable of ``{"image", "label"}`` batches (re-iterated
    as needed). Returns ``(model, params, metrics)``."""
    model = SmallCNN(num_classes=num_classes)
    batches = list(batches)
    if not batches:
        raise ValueError("no batches")
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.asarray(batches[0]["image"]))
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply(p, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean(), logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        return params, opt_state, loss, acc

    losses, accs = [], []
    i = 0
    while i < num_steps:
        for batch in batches:
            if i >= num_steps:
                break
            params, opt_state, loss, acc = step(
                params, opt_state, jnp.asarray(batch["image"]),
                jnp.asarray(batch["label"]))
            losses.append(float(loss))
            accs.append(float(acc))
            i += 1
    return model, params, {"final_loss": losses[-1],
                           "final_acc": float(np.mean(accs[-10:]))}
