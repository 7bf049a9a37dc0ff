"""Jitted train / eval step functions (single XLA program each).

The reference's per-video step crosses host<->device several times (label
generation on host, forward/loss on device, `.item()` syncs —
`src/anchor_based/train.py:77-131`).  Here the whole step — on-device
negative sampling, forward, masked losses, grads, Adam update — is one
compiled program over a padded batch of videos.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from edsnet_tpu.ops import losses as L


class TrainState(train_state.TrainState):
    constants: Any = None  # non-trainable collections (e.g. performer RFs)


def make_optimizer(lr: float, weight_decay: float) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay) semantics: L2 added to the grad
    *before* the Adam moments (anchor_based/train.py:54-55)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8),
    )


def resolve_batch(batch: Dict) -> Dict:
    """Materialize a gather-composed batch inside the jitted step.

    A batch is either explicit arrays, or a device-resident length-bucket
    ``pool`` plus per-step row indices (``gather_idx``) and a validity
    vector — the on-device recomposition path (data/batching.py:pool_items).
    The gather fuses into the step program; no host transfer occurs.
    """
    if "pool" not in batch:
        return batch
    idx = batch["gather_idx"]
    out = {k: v[idx] for k, v in batch["pool"].items()}
    out["video_valid"] = batch["video_valid"]
    return out


def _sample_marks_argsort_reference(eligible, num, rng):
    """Rank-of-random spec oracle for _sample_marks (the pre-round-3
    formulation): stable argsort of the uniform draws, keep ranks < num.
    Kept importable so the parity test and the step-breakdown benchmark
    measure/pin the SAME baseline."""
    shape = eligible.shape
    flat = eligible.reshape(-1)
    u = jax.random.uniform(rng, flat.shape)
    u = jnp.where(flat, u, jnp.inf)
    order = jnp.argsort(u)
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    return (flat & (rank < num)).reshape(shape)


def _sample_marks(eligible, num, rng):
    """Mark `num` random entries among `eligible` (rank-of-random).

    Device-side equivalent of anchor_helper.get_neg_label's shuffle
    (anchor_helper.py:53-71); `num` may be traced.

    Selects the `num` smallest uniform draws without a sort: a 32-step
    radix binary search over the (monotonic for non-negative floats)
    uint32 bit patterns finds the num-th smallest value with vectorized
    compare+count passes — sorts lower to slow bitonic networks on TPU,
    counts ride the VPU.  Ties at the threshold break by flat index,
    exactly argsort's stable order, so the selected SET is identical to
    the previous rank-of-random formulation.
    """
    shape = eligible.shape
    flat = eligible.reshape(-1)
    u = jax.random.uniform(rng, flat.shape)
    u = jnp.where(flat, u, jnp.inf)
    bits = jax.lax.bitcast_convert_type(u, jnp.uint32)

    # t ends as the bit pattern of the num-th smallest draw (1-indexed);
    # unrolled: 32 sequential scan kernels cost ~20x more dispatch than
    # the fused unrolled compare+count chain at these sizes
    t = jnp.uint32(0)
    for b in range(31, -1, -1):
        cand = t | jnp.uint32(1 << b)
        c = jnp.sum(bits < cand)
        t = jnp.where(c < num, cand, t)
    below = bits < t
    ties = bits == t
    need = num - jnp.sum(below)
    tie_sel = ties & (jnp.cumsum(ties) <= need)
    return (flat & (below | tie_sel)).reshape(shape)


def build_ab_cls_labels(batch: Dict, rng, neg_ratio: float, inc_ratio: float):
    """Per-video random negatives/incompletes -> final -1/0/1 labels."""
    b = batch["cls_pos"].shape[0]
    neg_rng, inc_rng = jax.random.split(rng)
    neg_rngs = jax.random.split(neg_rng, b)
    inc_rngs = jax.random.split(inc_rng, b)
    num_pos = batch["num_pos"]
    num_neg = (neg_ratio * num_pos).astype(jnp.int32)
    num_inc = (inc_ratio * num_pos).astype(jnp.int32)

    neg = jax.vmap(_sample_marks)(batch["neg_eligible"], num_neg, neg_rngs)
    inc = jax.vmap(_sample_marks)(batch["inc_eligible"], num_inc, inc_rngs)
    return jnp.where(neg | inc, -1, batch["cls_pos"])


def _cast_floats(tree, dtype):
    return jax.tree.map(
        lambda t: t.astype(dtype)
        if jnp.issubdtype(t.dtype, jnp.floating) else t, tree)


@partial(jax.jit, static_argnames=("lambda_reg", "neg_ratio", "inc_ratio",
                                   "remat", "compute_dtype"),
         donate_argnums=(0,))
def ab_train_step(state: TrainState, batch: Dict, rng, *, lambda_reg: float,
                  neg_ratio: float, inc_ratio: float, remat: bool = False,
                  compute_dtype: str = "float32"):
    """One anchor-based step over a padded batch. (anchor_based/train.py:77-131)

    ``remat`` wraps the forward in jax.checkpoint (recompute activations
    in the backward instead of saving them).  The step is HBM-bound
    (~1.6 GB accessed vs 56 GFLOP at B=8, N=512) so this LOOKED like a
    win — one measurement showed 1.47 -> 0.83 ms — but an interleaved
    A/B put it at parity-to-slightly-worse (medians 1.38 vs 1.53 ms; the
    remote compiler's schedule lottery swings single runs 2x).  Default
    OFF; the --remat flag exists for memory-pressured configs (large
    per-chip batches / long sequences), where trading HBM residency for
    recompute is the right call.

    ``compute_dtype='bfloat16'`` runs the forward/backward in bf16 with
    f32 master params and f32 losses/optimizer (standard mixed
    precision): measured 1.47 -> 1.30-1.34 ms and 1.6 GB -> 0.9 GB
    accessed — the one traffic-reduction lever that repeats across the
    platform's schedule lottery.  Default f32 (reference parity).
    """
    batch = resolve_batch(batch)
    drop_rng, label_rng = jax.random.split(rng)
    cls_label = build_ab_cls_labels(batch, label_rng, neg_ratio, inc_ratio)
    video_valid = batch["video_valid"] & (batch["num_pos"] > 0)

    cd = jnp.dtype(compute_dtype)

    def fwd(params, key):
        if cd != jnp.float32:
            params = _cast_floats(params, cd)
        if "motion" in batch:
            out = state.apply_fn(
                {"params": params, **(state.constants or {})},
                batch["seq"].astype(cd), batch["motion"].astype(cd),
                batch["mask"], batch["motion_mask"], deterministic=False,
                rngs={"dropout": key})
        else:
            out = state.apply_fn(
                {"params": params, **(state.constants or {})},
                batch["seq"].astype(cd), batch["mask"],
                deterministic=False, rngs={"dropout": key})
        return jax.tree.map(lambda t: t.astype(jnp.float32), out)

    if remat:
        fwd = jax.checkpoint(fwd)

    def loss_fn(params):
        pred_cls, pred_loc = fwd(params, drop_rng)
        loc = jax.vmap(L.ab_loc_loss)(pred_loc, batch["loc_label"], cls_label)
        cls = jax.vmap(L.ab_cls_loss)(pred_cls, cls_label)
        per_video = cls + lambda_reg * loc
        w = video_valid.astype(jnp.float32)
        denom = jnp.maximum(w.sum(), 1.0)
        loss = jnp.sum(per_video * w) / denom
        return loss, (jnp.sum(cls * w) / denom, jnp.sum(loc * w) / denom)

    (loss, (cls_loss, loc_loss)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads)
    metrics = {"loss": loss, "cls_loss": cls_loss, "loc_loss": loc_loss}
    return state, metrics


@partial(jax.jit, static_argnames=("lambda_reg", "lambda_ctr", "cls_kind",
                                   "reg_kind", "remat", "compute_dtype"),
         donate_argnums=(0,))
def af_train_step(state: TrainState, batch: Dict, rng, *, lambda_reg: float,
                  lambda_ctr: float, cls_kind: str, reg_kind: str,
                  remat: bool = False, compute_dtype: str = "float32"):
    """One anchor-free step over a padded batch. (anchor_free/train.py:55-88)

    ``remat`` / ``compute_dtype`` as in ab_train_step: opt-in activation
    rematerialization and bf16 mixed-precision compute.
    """
    batch = resolve_batch(batch)
    video_valid = batch["video_valid"]
    cd = jnp.dtype(compute_dtype)

    def fwd(params, key):
        if cd != jnp.float32:
            params = _cast_floats(params, cd)
        out = state.apply_fn(
            {"params": params, **(state.constants or {})},
            batch["seq"].astype(cd), batch["mask"], deterministic=False,
            rngs={"dropout": key})
        return jax.tree.map(lambda t: t.astype(jnp.float32), out)

    if remat:
        fwd = jax.checkpoint(fwd)

    def loss_fn(params):
        pred_cls, pred_loc, pred_ctr = fwd(params, rng)
        cls = jax.vmap(lambda p, t, m: L.af_cls_loss(p, t, cls_kind, m))(
            pred_cls, batch["target"], batch["mask"])
        loc = jax.vmap(lambda p, t, c: L.af_loc_loss(p, t, c, reg_kind))(
            pred_loc, batch["af_loc"], batch["target"])
        ctr = jax.vmap(L.af_ctr_loss)(pred_ctr, batch["af_ctr"],
                                      batch["target"])
        per_video = cls + lambda_reg * loc + lambda_ctr * ctr
        w = video_valid.astype(jnp.float32)
        denom = jnp.maximum(w.sum(), 1.0)
        loss = jnp.sum(per_video * w) / denom
        return loss, (jnp.sum(cls * w) / denom, jnp.sum(loc * w) / denom,
                      jnp.sum(ctr * w) / denom)

    (loss, (cls_loss, loc_loss, ctr_loss)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads)
    metrics = {"loss": loss, "cls_loss": cls_loss, "loc_loss": loc_loss,
               "ctr_loss": ctr_loss}
    return state, metrics
