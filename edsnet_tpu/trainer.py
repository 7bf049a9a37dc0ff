"""Training loops (anchor-based + anchor-free), data-parallel over a mesh.

Reference: `src/anchor_based/train.py`, `src/anchor_free/train.py`.
Differences by design:
- per-video labels are precomputed once (epoch-invariant in the reference
  but regenerated every epoch there — see data/batching.py);
- the step is a single jitted program over a padded batch of videos sharded
  across the ``('data',)`` mesh (batch_size=1 reproduces the reference's
  per-video optimizer stepping);
- eval each epoch is jitted per length bucket; best checkpoint saved with
  the reference's path contract.
"""
from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from edsnet_tpu.data import batching
from edsnet_tpu.data.dataset import AverageMeter, VideoDataset
from edsnet_tpu.evaluate import evaluate
from edsnet_tpu.parallel.eval_device import evaluate_on_device
from edsnet_tpu.models.model_zoo import get_model
from jax.sharding import NamedSharding, PartitionSpec as P

from edsnet_tpu.parallel import make_mesh, replicate, shard_batch
from edsnet_tpu.parallel.steps import (TrainState, ab_train_step,
                                       af_train_step, make_optimizer)
from edsnet_tpu.utils import checkpoint as ckpt_lib
from edsnet_tpu.utils.profiling import StepTimer, maybe_trace

logger = logging.getLogger()


def _init_state(model, args, sample_batch, place_params=None) -> TrainState:
    rngs = {"params": jax.random.PRNGKey(args.seed),
            "dropout": jax.random.PRNGKey(args.seed + 1)}
    if "motion" in sample_batch:
        variables = model.init(rngs, jnp.asarray(sample_batch["seq"]),
                               jnp.asarray(sample_batch["motion"]),
                               jnp.asarray(sample_batch["mask"]),
                               jnp.asarray(sample_batch["motion_mask"]))
    else:
        variables = model.init(rngs, jnp.asarray(sample_batch["seq"]),
                               jnp.asarray(sample_batch["mask"]))
    params = variables["params"]
    if place_params is not None:
        # placing BEFORE optimizer init makes the Adam moments inherit
        # the same shardings (zeros_like preserves placement)
        params = place_params(params)
    constants = {k: v for k, v in variables.items() if k != "params"}
    tx = make_optimizer(args.lr, args.weight_decay)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx,
                             constants=constants)


def _array_batch(batch):
    return {k: v for k, v in batch.items()
            if isinstance(v, np.ndarray)}


def train(args, split, save_path) -> Tuple[float, List[float], List[int]]:
    """Train one split; returns (max_val_fscore, f1_list, epoch_list).

    Signature contract matches the reference trainers
    (anchor_based/train.py:27, anchor_free/train.py:15).
    """
    is_ab = args.model == "anchor-based"
    from edsnet_tpu.utils.runtime import resolve_compute_dtype
    compute_dtype = resolve_compute_dtype(
        getattr(args, "compute_dtype", None))
    if compute_dtype != "float32":
        logger.info(f"compute dtype: {compute_dtype} "
                    f"(--compute-dtype float32 to opt out)")
    model = get_model(args.model, model_depth=args.model_depth, **{
        k: v for k, v in vars(args).items() if k != "model_depth"})

    from edsnet_tpu.parallel.eval_device import model_needs_motion
    train_set = VideoDataset(split["train_keys"], args.data_root)
    items = batching.prepare_items(
        train_set, args.model, anchor_scales=args.anchor_scales,
        pos_iou=args.pos_iou_thresh, neg_iou=args.neg_iou_thresh,
        inc_iou=args.incomplete_iou_thresh, bucket_size=args.bucket_size,
        need_motion=model_needs_motion(model))
    skipped = len(train_set) - len(items)
    if skipped:
        logger.info(f"skipped {skipped} videos (NaN gtscore / empty target)")
    if not items:
        raise ValueError(
            "no trainable videos: every video was skipped (NaN gtscore or "
            "empty keyshot target at the 15% budget)")

    val_set = VideoDataset(split["test_keys"], args.data_root)
    val_records = [val_set[i] for i in range(len(val_set))]

    if args.model_depth == "cross-attention":
        missing = [it.key for it in items if it.motion is None]
        if missing:
            raise ValueError(
                f"model-depth cross-attention needs 'motion_features' in "
                f"the h5 for every video; missing for {missing[:3]}...")
    tp = int(getattr(args, "tensor_parallel", 0) or 0)
    place_params = None
    if tp > 1:
        # 2-D ('data','model') mesh: batch over dp devices, attention
        # heads over tp (Megatron-style; parallel/tensor_parallel.py).
        # The jitted steps are unchanged — XLA inserts the gradient psum
        # over data and the per-layer fc all-reduce over model.
        from edsnet_tpu.parallel.tensor_parallel import (make_dp_tp_mesh,
                                                         shard_params_tp)
        total = args.num_devices or len(jax.devices())
        if total % tp:
            raise ValueError(f"--tensor-parallel {tp} must divide the "
                             f"device count {total}")
        mesh = make_dp_tp_mesh(total // tp, tp)
        place_params = lambda p: shard_params_tp(p, mesh, args.num_head)
    else:
        mesh = make_mesh(args.num_devices)
    cp = int(getattr(args, "context_parallel", 0) or 0)
    if cp:
        # the eval-time ring must span the SAME device set as the
        # training mesh (mixed device sets inside one jit are rejected),
        # so it rides a reshape of it: ('data','seq'[,'model']) with the
        # batch and tp head axes composing (models/attention._ring_plan)
        from edsnet_tpu.models.base import (disable_ring_attention,
                                            set_ring_mesh)
        from edsnet_tpu.parallel.mesh import make_ring_mesh
        seq_cap = mesh.size // max(tp, 1)   # devices left for the ring
        cp_eff = min(cp, seq_cap) if cp > 0 else seq_cap
        if cp_eff < 2:
            logger.warning(
                f"--context-parallel {cp}: ring attention needs >=2 "
                f"sequence-axis devices but only {mesh.size} device(s) "
                f"are available" + (f" with --tensor-parallel {tp}"
                                    if tp > 1 else "")
                + "; ring attention stays off")
            # the module may have context_parallel baked in from the CLI
            # configure call — explicitly force the dense path so its
            # standalone fallback can't build a private mesh that clashes
            # with arrays committed to the training mesh
            disable_ring_attention()
        else:
            if 0 < cp != cp_eff:
                logger.warning(f"--context-parallel {cp} clamped to "
                               f"{cp_eff} ({mesh.size} device(s)"
                               + (f", {tp} on the tensor axis" if tp > 1
                                  else "") + ")")
            ring = make_ring_mesh(cp_eff, tp, num_devices=mesh.size)
            set_ring_mesh(ring, "seq", batch_axis="data",
                          head_axis="model" if tp > 1 else None)
    # batch rows are padded to a multiple of this; --pad-batch-to fixes it
    # above the mesh size so batch shapes (and hence dropout/negative-
    # sampling RNG streams) are identical whatever the mesh.  Rows shard
    # over the DATA axis only, so that is the padding quantum.
    mesh_n = int(mesh.shape["data"])
    pad_to = int(getattr(args, "pad_batch_to", 0) or 0)
    n_dev = -(-max(pad_to, mesh_n) // mesh_n) * mesh_n
    # eval inputs live on device across epochs (tunnel uploads are slow),
    # committed SHARDED over the data axis so per-epoch eval partitions
    # across the same devices as the train step (uncommitted eval inputs
    # inherit the params' replicated sharding and every device would
    # redundantly compute the full eval)
    prepared_eval = None
    if not getattr(args, "host_eval", False):
        from edsnet_tpu.parallel.eval_device import prepare_eval_batches
        prepared_eval = prepare_eval_batches(
            val_records, max(args.batch_size, 1), args.bucket_size,
            need_motion=model_needs_motion(model), mesh=mesh)
    rng = np.random.RandomState(args.seed)
    step_rng = jax.random.PRNGKey(args.seed + 2)

    first_batch = next(batching.batch_items(
        items, args.batch_size, args.bucket_size, shuffle=False,
        pad_batch_to=n_dev))
    state = _init_state(model, args, first_batch, place_params=place_params)
    if tp > 1 and not any(
            "model" in str(x.sharding.spec)
            for x in jax.tree.leaves(state.params)):
        logger.warning(f"--tensor-parallel {tp} has no effect: base model "
                       f"'{args.base_model}' has no attention modules")

    max_val_fscore = -1.0
    start_epoch = 0
    state_path = Path(str(save_path) + ".state")
    if getattr(args, "resume", False) and state_path.exists():
        # flax from_state_dict replaces every leaf with host numpy, which
        # would silently drop the tensor-parallel head shardings on the
        # first recompile — re-place each restored leaf with the mesh
        # sharding its freshly-initialized template had.  Only leaves that
        # went through place_params carry a NamedSharding; the rest stay
        # uncommitted numpy (jit auto-places them, as before tp existed).
        placements = None
        if place_params is not None:
            placements = jax.tree.map(
                lambda x: x.sharding if isinstance(x, jax.Array)
                and isinstance(x.sharding, NamedSharding) else "host",
                state)
        state, start_epoch, max_val_fscore, extras = \
            ckpt_lib.load_train_state(state, state_path)
        if placements is not None:
            state = jax.tree.map(
                lambda leaf, sh: leaf if isinstance(sh, str)
                else jax.device_put(leaf, sh), state, placements)
        if "np_rng" in extras:
            ckpt_lib.restore_np_rng(rng, extras["np_rng"])
        if "step_rng" in extras:
            step_rng = jnp.asarray(extras["step_rng"], jnp.uint32)
        logger.info(f"resumed from {state_path} at epoch {start_epoch} "
                    f"(best F-score {max_val_fscore:.4f})")
    epoch_list: List[int] = []
    f1_list: List[float] = []
    time_list: List[float] = []
    timer = StepTimer()
    profile_dir = str(Path(args.model_dir) / "profile")

    # Videos are uploaded to the device ONCE, grouped by length bucket, and
    # every epoch's batches are composed on device by gathering rows from
    # the resident pools: per-epoch reshuffling of batch MEMBERSHIP (the
    # reference's video loop reshuffles every epoch,
    # anchor_based/train.py:70-77) at zero host-transfer cost (23 MB/batch
    # at B=8,N=704 would dominate on a tunneled platform).
    # ``--static-batches`` keeps round-1 behavior: fixed compositions,
    # shuffled visit order (identical regimes at batch_size=1 either way).
    static = bool(getattr(args, "static_batches", False))
    if static:
        device_batches = [
            shard_batch(_array_batch(b), mesh)
            for b in batching.batch_items(items, args.batch_size,
                                          args.bucket_size, shuffle=False,
                                          pad_batch_to=n_dev)]
        frames_per_batch = [int(np.sum(np.asarray(b["mask"])))
                            for b in device_batches]
    else:
        pools = batching.pool_items(items, args.bucket_size)
        pool_lengths = [np.sum(np.asarray(p["mask"]), axis=1)
                        for p in pools]   # [count] true frames per video
        device_pools = [replicate(_array_batch(p), mesh) for p in pools]
        idx_sharding = NamedSharding(mesh, P("data"))

    def compose_epoch():
        """Host-side plan: (pool_id, gather_idx, video_valid, frames)."""
        plan = []
        for pi, pool in enumerate(pools):
            count = pool["video_valid"].shape[0]
            perm = rng.permutation(count)
            for lo in range(0, count, args.batch_size):
                chunk = perm[lo:lo + args.batch_size]
                b_pad = -(-len(chunk) // n_dev) * n_dev
                idx = np.zeros(b_pad, np.int32)
                idx[:len(chunk)] = chunk
                valid = np.zeros(b_pad, bool)
                valid[:len(chunk)] = True
                plan.append((pi, idx, valid,
                             int(pool_lengths[pi][chunk].sum())))
        rng.shuffle(plan)
        return plan

    # Async best-checkpoint tracking: the best params live ON DEVICE and
    # the per-epoch F-score stays a device scalar, so steady-state epochs
    # run with ZERO host round-trips (a tunnel sync costs 100ms+ and was
    # the wall-clock floor).  Host code syncs only on logging epochs —
    # where it also flushes the best checkpoint (and, under --resume, the
    # full train state) to disk, so a crash loses at most one logging
    # window — and once at the end.  --host-eval keeps the per-epoch host
    # path (it needs host-side summaries every epoch).
    async_best = prepared_eval is not None
    flushed_best = max_val_fscore  # best F-score already persisted on disk
    if async_best:
        from edsnet_tpu.parallel.eval_device import eval_fscore_device

        # fresh buffers: ab/af_train_step donates the state, which would
        # invalidate a bare reference to the initial params
        best_params_dev = jax.tree.map(jnp.copy, state.params)
        best_f_dev = jnp.float32(max_val_fscore)
        fscore_hist: List = []
        last_sync_t = time.time()
        last_sync_epoch = start_epoch - 1

        @jax.jit
        def update_best(params, best_params, val_f, best_f):
            improved = val_f > best_f
            new_best = jax.tree.map(
                lambda p, b: jnp.where(improved, p, b), params,
                best_params)
            return new_best, jnp.maximum(val_f, best_f)

    epoch_metrics: List = []
    for epoch in range(start_epoch, args.max_epoch):
        start = time.time()
        stats = AverageMeter("loss", "cls_loss", "loc_loss", "ctr_loss")

        with maybe_trace(args.profile and epoch == 1, profile_dir):
            if static:
                order = rng.permutation(len(device_batches))
                todo = [(device_batches[bi], frames_per_batch[bi])
                        for bi in order]
            else:
                todo = [({"pool": device_pools[pi],
                          "gather_idx": jax.device_put(idx, idx_sharding),
                          "video_valid": jax.device_put(valid, idx_sharding)},
                         frames)
                        for pi, idx, valid, frames in compose_epoch()]
            for dev_batch, frames in todo:
                step_rng, sub = jax.random.split(step_rng)
                timer.start()
                if is_ab:
                    state, metrics = ab_train_step(
                        state, dev_batch, sub, lambda_reg=args.lambda_reg,
                        neg_ratio=args.neg_sample_ratio,
                        inc_ratio=args.incomplete_sample_ratio,
                        remat=bool(getattr(args, "remat", False)),
                        compute_dtype=compute_dtype)
                else:
                    state, metrics = af_train_step(
                        state, dev_batch, sub, lambda_reg=args.lambda_reg,
                        lambda_ctr=args.lambda_ctr, cls_kind=args.cls_loss,
                        reg_kind=args.reg_loss,
                        remat=bool(getattr(args, "remat", False)),
                        compute_dtype=compute_dtype)
                timer.stop(frames,
                           sync=metrics["loss"] if args.profile else None)
                # keep metrics on device; a per-step float() would force a
                # sync and stall the dispatch pipeline
                epoch_metrics.append(metrics)

        time_list.append(time.time() - start)
        if epoch < 3 or (epoch + 1) % 50 == 0:
            # async epochs only enqueue work; the fenced device time is
            # reported at logging epochs (where the sync is already paid)
            verb = "dispatched" if async_best else "trained"
            logger.info(f"epoch {epoch} {verb} in {time_list[-1]:.2f}s")

        eval_every = max(getattr(args, "eval_every", 1), 1)
        save_every = getattr(args, "state_save_every", 0)
        if (async_best and getattr(args, "resume", False) and save_every > 0
                and (epoch + 1) % save_every == 0):
            # opt-in tighter crash-replay window: persist the train state
            # every N epochs REGARDLESS of the eval/logging cadence
            # (costs a host sync).  The saved best-F must never outrun the
            # on-disk checkpoint: flush best_params_dev first whenever the
            # device-side best advanced since the last flush, else a
            # crash+resume would restore a high watermark whose params
            # were lost (best_params_dev resets to current params).
            best_f = float(best_f_dev)
            if best_f > flushed_best:
                ckpt_lib.save_checkpoint(
                    {"params": best_params_dev,
                     **(state.constants or {})}, save_path)
                flushed_best = best_f
            ckpt_lib.save_train_state(
                state, epoch + 1, best_f, state_path,
                np_rng=rng, step_rng=step_rng)
        if (epoch + 1) % eval_every and epoch + 1 != args.max_epoch:
            continue
        variables = {"params": state.params, **(state.constants or {})}
        log_every = max(30 if is_ab else 20, eval_every)
        should_log = epoch % log_every < eval_every

        if async_best:
            # device eval -> device best-params update; nothing synced
            val_f_dev = eval_fscore_device(model, variables, prepared_eval,
                                           args.nms_thresh)
            best_params_dev, best_f_dev = update_best(
                state.params, best_params_dev, val_f_dev, best_f_dev)
            fscore_hist.append(val_f_dev)
            epoch_list.append(epoch)
            if should_log:
                for m in jax.device_get(epoch_metrics):
                    stats.update(**{k: float(v) for k, v in m.items()})
                epoch_metrics.clear()
                # device_get fenced every epoch dispatched since the last
                # sync: wall time across that span is honest device time
                best_f = float(best_f_dev)  # fences through the eval too
                now = time.time()
                span = epoch - last_sync_epoch
                device_avg = (now - last_sync_t) / max(span, 1)
                last_sync_t, last_sync_epoch = now, epoch
                logger.info(
                    f"Epoch: {epoch}/{args.max_epoch} "
                    f"Loss: {stats.cls_loss:.4f}/{stats.loc_loss:.4f}"
                    f"/{stats.loss:.4f} "
                    f"F-score cur/max: {float(val_f_dev):.4f}/"
                    f"{best_f:.4f} "
                    f"Dispatch: {time_list[-1]:.2f}s "
                    f"Device: {device_avg:.2f}s/epoch "
                    f"(fenced, avg of {span})")
                # crash durability: persist the best-so-far checkpoint
                # whenever the device-side best improved since last flush
                if best_f > flushed_best:
                    ckpt_lib.save_checkpoint(
                        {"params": best_params_dev,
                         **(state.constants or {})}, save_path)
                    flushed_best = best_f
                if getattr(args, "resume", False):
                    ckpt_lib.save_train_state(
                        state, epoch + 1, best_f, state_path,
                        np_rng=rng, step_rng=step_rng)
            continue

        # synchronous host path (--host-eval)
        for m in jax.device_get(epoch_metrics):
            stats.update(**{k: float(v) for k, v in m.items()})
        epoch_metrics.clear()
        if prepared_eval is None:
            val_fscore, _ = evaluate(model, variables, val_records,
                                     args.nms_thresh,
                                     batch_size=max(args.batch_size, 1),
                                     bucket_size=args.bucket_size)
        else:
            val_fscore, _ = evaluate_on_device(
                model, variables, val_records, args.nms_thresh,
                batch_size=max(args.batch_size, 1),
                bucket_size=args.bucket_size, prepared=prepared_eval)
        f1_list.append(val_fscore)
        epoch_list.append(epoch)

        if max_val_fscore < val_fscore:
            max_val_fscore = val_fscore
            ckpt_lib.save_checkpoint(variables, save_path)
        if getattr(args, "resume", False):
            ckpt_lib.save_train_state(state, epoch + 1, max_val_fscore,
                                      state_path, np_rng=rng,
                                      step_rng=step_rng)

        if should_log:
            logger.info(f"Epoch: {epoch}/{args.max_epoch} "
                        f"Loss: {stats.cls_loss:.4f}/{stats.loc_loss:.4f}"
                        f"/{stats.loss:.4f} "
                        f"F-score cur/max: {val_fscore:.4f}/"
                        f"{max_val_fscore:.4f} "
                        f"Time: {time_list[-1]:.2f}s")

    if async_best:
        # single end-of-training sync: history, best params, checkpoint
        f1_list = [float(v) for v in jax.device_get(fscore_hist)]
        best_f = float(best_f_dev)
        max_val_fscore = max(max_val_fscore, best_f)
        if best_f > flushed_best:
            ckpt_lib.save_checkpoint(
                {"params": best_params_dev, **(state.constants or {})},
                save_path)
        if getattr(args, "resume", False):
            ckpt_lib.save_train_state(
                state, args.max_epoch, max_val_fscore, state_path,
                np_rng=rng, step_rng=step_rng)

    if time_list:
        t = np.asarray(time_list)
        logger.info(f"avg time taken: {t.mean():.3f} "
                    f"max time taken: {t.max():.3f} "
                    f"min time taken: {t.min():.3f}")
    logger.info(f"train throughput: {timer.summary()}")
    return max_val_fscore, f1_list, epoch_list
