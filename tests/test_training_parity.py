"""Training-dynamics parity: identical init + batches → identical loss curve.

The strongest behavioral check short of full-cohort training: the reference's
RNA Cox training (torch Adam, two LR groups) and ours are run from the SAME
initial weights on the SAME deterministic batch sequence with dropout
disabled; per-step losses must match to fp32 tolerance for several steps.
Covers: weight conversion, Cox loss semantics, torch-Adam parity, and the
train-step wiring, end to end.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

REF = "/root/reference/2_GeneExpression"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)


def test_rna_cox_training_losses_match_reference():
    tn = torch.nn
    torch.manual_seed(0)
    G, H1, H2, N = 60, 32, 16, 40

    # torch side: reference-style model (Dropout p=0 → deterministic)
    enc = tn.Sequential(tn.Dropout(0.0), tn.Linear(G, H1), tn.ReLU(),
                        tn.Dropout(0.0), tn.Linear(H1, H2))
    head = tn.Sequential(tn.Linear(H2, 1))

    rng = np.random.default_rng(0)
    X = rng.normal(size=(N, G)).astype(np.float32)
    t = rng.uniform(1, 100, N).astype(np.float32)
    e = (rng.uniform(size=N) < 0.8).astype(np.float32)

    # the reference's own loss + optimizer arrangement
    from tests.test_reference_parity import _import_ref

    ref_models = _import_ref("models", REF)

    opt = torch.optim.Adam(
        [{"params": enc.parameters(), "lr": 1e-3},
         {"params": head.parameters(), "lr": 1e-2}],
        weight_decay=1e-4,
    )
    torch_losses = []
    for step in range(6):
        opt.zero_grad()
        out = head(enc(torch.tensor(X)))
        loss = ref_models.cox_loss(
            out.view(-1), torch.tensor(t), torch.tensor(e)
        )
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    # ours: same init via manual conversion, same groups, parity Cox loss
    from multimodalbrainsurvival_tpu.models import RNAEncoder, RNAOnlyModel
    from multimodalbrainsurvival_tpu.ops import cox_partial_likelihood_loss
    from multimodalbrainsurvival_tpu.train.optim import (
        build_grouped_optimizer,
        path_prefix_match,
        torch_adam,
    )
    import optax

    torch.manual_seed(0)
    enc2 = tn.Sequential(tn.Dropout(0.0), tn.Linear(G, H1), tn.ReLU(),
                         tn.Dropout(0.0), tn.Linear(H1, H2))
    head2 = tn.Sequential(tn.Linear(H2, 1))  # identical init (same seed)

    params = {
        "encoder": {
            "dense_0": {"kernel": jnp.array(enc2[1].weight.detach().numpy().T),
                        "bias": jnp.array(enc2[1].bias.detach().numpy())},
            "dense_1": {"kernel": jnp.array(enc2[4].weight.detach().numpy().T),
                        "bias": jnp.array(enc2[4].bias.detach().numpy())},
        },
        "final": {"kernel": jnp.array(head2[0].weight.detach().numpy().T),
                  "bias": jnp.array(head2[0].bias.detach().numpy())},
    }
    model = RNAOnlyModel(encoder=RNAEncoder(hidden_dims=(H1, H2), dropout=0.0))
    tx, _ = build_grouped_optimizer(
        params,
        [("rna", path_prefix_match("encoder"), torch_adam(1e-3, 1e-4)),
         ("mlp", path_prefix_match("final"), torch_adam(1e-2, 1e-4))],
    )
    opt_state = tx.init(params)
    Xj, tj, ej = jnp.array(X), jnp.array(t), jnp.array(e)

    @jax.jit
    def step_fn(params, opt_state):
        def loss_fn(p):
            out = model.apply({"params": p}, Xj, train=False)
            return cox_partial_likelihood_loss(out[:, 0], tj, ej)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    our_losses = []
    for _ in range(6):
        params, opt_state, loss = step_fn(params, opt_state)
        our_losses.append(float(loss))

    np.testing.assert_allclose(our_losses, torch_losses, rtol=2e-4)
