"""Checkpoint save/load with the reference's on-disk naming contract.

Reference: best-validation state_dict per split saved to
`{model_dir}/checkpoint/{split_file}.{idx}.pt`
(`src/anchor_based/train.py:143-145`, `src/helpers/data_helper.py:106-110`).
We keep the exact path contract; the payload is flax msgpack (the full
variables dict: params + non-trainable constants).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Tuple

import jax
from flax import serialization


def save_checkpoint(variables: Any, path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(variables))


def save_train_state(state, epoch: int, best_fscore: float, path,
                     np_rng=None, step_rng=None) -> None:
    """Full resumable training snapshot (params + optimizer + progress).

    The reference can only save model weights (save-only, no resume —
    SURVEY.md §5); this adds elastic restartability.  When the RNG states
    are supplied (the trainer's numpy batch-composition RandomState and the
    jax per-step key), a resumed run replays the exact batch order and
    dropout/negative-sampling draws of an uninterrupted one.
    """
    payload = {
        "state": serialization.to_state_dict(state),
        "epoch": epoch,
        "best_fscore": best_fscore,
    }
    if np_rng is not None:
        name, keys, pos, has_gauss, cached = np_rng.get_state()
        payload["np_rng"] = {"keys": keys, "pos": pos,
                             "has_gauss": has_gauss, "cached": cached}
    if step_rng is not None:
        import numpy as np
        payload["step_rng"] = np.asarray(step_rng)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.msgpack_serialize(payload))


def load_train_state(state_template, path):
    """Restore (state, next_epoch, best_fscore, extras) from a snapshot.

    ``extras`` carries the optional RNG states (``np_rng``/``step_rng``)
    when the snapshot recorded them; empty dict for older snapshots.
    """
    raw = serialization.msgpack_restore(Path(path).read_bytes())
    state = serialization.from_state_dict(state_template, raw["state"])
    extras = {k: raw[k] for k in ("np_rng", "step_rng") if k in raw}
    return state, int(raw["epoch"]), float(raw["best_fscore"]), extras


def restore_np_rng(rng, payload) -> None:
    """Apply a saved numpy RandomState payload in place."""
    rng.set_state(("MT19937", payload["keys"], int(payload["pos"]),
                   int(payload["has_gauss"]), float(payload["cached"])))


def load_checkpoint(model, path, example_input: Tuple) -> Any:
    """Restore variables; the template comes from a throwaway init."""
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(0)}
    template = jax.eval_shape(lambda: model.init(rngs, *example_input))
    template = jax.tree.map(
        lambda s: jax.numpy.zeros(s.shape, s.dtype), template)
    data = Path(path).read_bytes()
    return serialization.from_bytes(template, data)
