"""5-step training-trajectory parity at batch_size=1.

Identical weights, identical labels, dropout off on both sides (the only
stochastic element; the reference trains with p=0.5 dropout whose draws
cannot be aligned across frameworks).  Asserts per-step losses track each
other through torch.optim.Adam vs our make_optimizer (the torch-Adam
L2-before-moments chain, parallel/steps.py:26-32).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from edsnet_tpu.models.dsnet import DSNet
from edsnet_tpu.models.dsnet_af import DSNetAF
from edsnet_tpu.ops import losses as L
from edsnet_tpu.parallel.steps import make_optimizer
from tests.parity import bridge

F_DIM, H_DIM, N_HEAD, FC_DEPTH, N = 32, 16, 2, 2, 40
LR, WD, LAMBDA = 1e-3, 1e-5, 1.0
STEPS = 5


def _ab_labels(seed=11, s=2):
    rng = np.random.RandomState(seed)
    cls_label = rng.choice([-1.0, 0.0, 1.0], (N, s),
                           p=[0.3, 0.4, 0.3]).astype(np.float32)
    loc_label = rng.randn(N, s, 2).astype(np.float32)
    return cls_label, loc_label


def test_ab_training_trajectory(ref):
    scales = [4, 8]
    tmod = ref.ab_dsnet.DSNet("attention", F_DIM, H_DIM, scales, N_HEAD,
                              fc_depth=FC_DEPTH, orientation="paper",
                              pooling_type="roi").eval()
    ours = DSNet("attention", F_DIM, H_DIM, scales, N_HEAD,
                 fc_depth=FC_DEPTH, pooling_type="roi")
    params, _ = bridge.dsnet_params(tmod, "attention", "roi", F_DIM)
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.RandomState(5)
    x = rng.randn(1, N, F_DIM).astype(np.float32)
    cls_label, loc_label = _ab_labels(s=len(scales))

    opt = torch.optim.Adam(tmod.parameters(), lr=LR, weight_decay=WD)
    xt = torch.from_numpy(x)
    clt = torch.from_numpy(cls_label)
    llt = torch.from_numpy(loc_label)
    torch_losses = []
    for _ in range(STEPS):
        pred_cls, pred_loc = tmod(xt)
        loss = ref.ab_losses.calc_cls_loss(pred_cls, clt) + \
            LAMBDA * ref.ab_losses.calc_loc_loss(pred_loc, llt, clt)
        opt.zero_grad()
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    tx = make_optimizer(LR, WD)
    opt_state = tx.init(params)
    xj = jnp.asarray(x)
    clj = jnp.asarray(cls_label)
    llj = jnp.asarray(loc_label)

    def loss_fn(p):
        pred_cls, pred_loc = ours.apply({"params": p}, xj)
        return L.ab_cls_loss(pred_cls[0], clj) + \
            LAMBDA * L.ab_loc_loss(pred_loc[0], llj, clj)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    jax_losses = []
    for _ in range(STEPS):
        params, opt_state, loss = step(params, opt_state)
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=5e-4,
                               err_msg="AB 5-step loss trajectory")


def test_af_training_trajectory(ref):
    tmod = ref.af_dsnet.DSNetAF("attention", F_DIM, H_DIM, N_HEAD,
                                fc_depth=FC_DEPTH).eval()
    ours = DSNetAF("attention", F_DIM, H_DIM, N_HEAD, fc_depth=FC_DEPTH)
    params, _ = bridge.dsnet_af_params(tmod, "attention", F_DIM)
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.RandomState(6)
    x = rng.randn(1, N, F_DIM).astype(np.float32)
    target = (rng.rand(N) > 0.6).astype(np.float32)
    if target.sum() == 0:
        target[0] = 1.0
    loc_label = rng.uniform(0.5, 6.0, (N, 2)).astype(np.float32)
    ctr_label = rng.uniform(0.0, 1.0, N).astype(np.float32)

    opt = torch.optim.Adam(tmod.parameters(), lr=LR, weight_decay=WD)
    xt = torch.from_numpy(x)
    tt = torch.from_numpy(target)
    llt = torch.from_numpy(loc_label)
    ctt = torch.from_numpy(ctr_label)
    torch_losses = []
    for _ in range(STEPS):
        pred_cls, pred_loc, pred_ctr = tmod(xt)
        loss = ref.af_losses.calc_cls_loss(pred_cls, tt) + \
            LAMBDA * ref.af_losses.calc_loc_loss(pred_loc, llt, tt) + \
            ref.af_losses.calc_ctr_loss(pred_ctr, ctt, tt)
        opt.zero_grad()
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    tx = make_optimizer(LR, WD)
    opt_state = tx.init(params)
    xj, tj = jnp.asarray(x), jnp.asarray(target)
    llj, ctj = jnp.asarray(loc_label), jnp.asarray(ctr_label)

    def loss_fn(p):
        pred_cls, pred_loc, pred_ctr = ours.apply({"params": p}, xj)
        return L.af_cls_loss(pred_cls[0], tj) + \
            LAMBDA * L.af_loc_loss(pred_loc[0], llj, tj) + \
            L.af_ctr_loss(pred_ctr[0], ctj, tj)

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    jax_losses = []
    for _ in range(STEPS):
        params, opt_state, loss = step(params, opt_state)
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=5e-4,
                               err_msg="AF 5-step loss trajectory")
