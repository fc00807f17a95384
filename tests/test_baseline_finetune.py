"""Baseline finetuning: one optimizer step reduces loss for each family."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdvnet.baselines import finetune as FT
from tdvnet.data import synthetic

IMG = (48, 64)


@pytest.mark.slow
def test_fastmvsnet_finetune_step_decreases_loss():
    from tdvnet.baselines import fastmvsnet as FM

    model, variables = FM.init_fastmvsnet(jax.random.PRNGKey(0), IMG, 3,
                                          (0.5, 0.2, 16))
    sc = synthetic.make_scene(n_views=3, img_size=IMG, seed=2)
    batch = (jnp.asarray(sc["images"]), jnp.asarray(sc["rotmats"]),
             jnp.asarray(sc["tvecs"]), jnp.asarray(sc["K"]),
             jnp.asarray([1]), jnp.asarray([[0, 2]]),
             jnp.ones((1, 2), bool), jnp.asarray(sc["depth"][1:2]))
    state = FT.create_finetune_state(variables, lr=1e-3,
                                     apply_fn=model.apply)
    step = FT.make_finetune_step(FT.fastmvsnet_apply_loss(model))
    losses = []
    for _ in range(4):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_gpmvs_finetune_step():
    from tdvnet.baselines import gpmvs as G

    model, variables = G.init_gpmvs(jax.random.PRNGKey(0), IMG, seq_len=2)
    rng = np.random.default_rng(0)
    batch = (jnp.asarray(rng.normal(size=(2, *IMG, 3)).astype(np.float32)),
             jnp.asarray(rng.uniform(size=(2, *IMG, G.N_PLANES))
                         .astype(np.float32)),
             jnp.zeros((2, 2)),
             jnp.asarray(rng.uniform(1, 3, size=(2, *IMG))
                         .astype(np.float32)))
    state = FT.create_finetune_state(variables, lr=1e-3,
                                     apply_fn=model.apply)
    step = FT.make_finetune_step(FT.gpmvs_apply_loss(model))
    l0 = float(step(state, batch)[1])
    state2, _ = step(state, batch)
    for _ in range(3):
        state2, l1 = step(state2, batch)
    assert np.isfinite(l0) and float(l1) < l0
