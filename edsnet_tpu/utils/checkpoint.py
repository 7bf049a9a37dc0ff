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


def save_train_state(state, epoch: int, best_fscore: float, path) -> None:
    """Full resumable training snapshot (params + optimizer + progress).

    The reference can only save model weights (save-only, no resume —
    SURVEY.md §5); this adds elastic restartability.
    """
    payload = {
        "state": serialization.to_state_dict(state),
        "epoch": epoch,
        "best_fscore": best_fscore,
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.msgpack_serialize(payload))


def load_train_state(state_template, path):
    """Restore (state, next_epoch, best_fscore) from a snapshot."""
    raw = serialization.msgpack_restore(Path(path).read_bytes())
    state = serialization.from_state_dict(state_template, raw["state"])
    return state, int(raw["epoch"]), float(raw["best_fscore"])


def load_checkpoint(model, path, example_input: Tuple) -> Any:
    """Restore variables; the template comes from a throwaway init."""
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(0)}
    template = jax.eval_shape(lambda: model.init(rngs, *example_input))
    template = jax.tree.map(
        lambda s: jax.numpy.zeros(s.shape, s.dtype), template)
    data = Path(path).read_bytes()
    return serialization.from_bytes(template, data)
