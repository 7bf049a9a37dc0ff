"""Model information CLI: parameter counts per head/depth configuration.

Reference: `src/printing_model_information.py` (torchinfo summaries).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from edsnet_tpu import config as config_lib
from edsnet_tpu.models.model_zoo import get_model


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree.leaves(tree))


def summarize(model, num_feature: int, seq_len: int = 128) -> str:
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    x = jnp.zeros((1, seq_len, num_feature), jnp.float32)
    mask = jnp.ones((1, seq_len), bool)
    if model.__class__.__name__ == "DSNetMotionFeatures":
        motion = jnp.zeros((1, seq_len, num_feature), jnp.float32)
        variables = model.init(rngs, x, motion, mask, mask)
    else:
        variables = model.init(rngs, x, mask)
    lines = [f"{model.__class__.__name__}:"]
    total = 0
    for coll, tree in variables.items():
        n = count_params(tree)
        total += n
        lines.append(f"  {coll}: {n:,}")
    lines.append(f"  total: {total:,}")
    return "\n".join(lines)


def main(argv=None):
    args = config_lib.get_arguments(argv)
    model = get_model(args.model, **vars(args))
    print(f"config: model={args.model} depth={args.model_depth} "
          f"base={args.base_model} pooling={args.pooling_type}")
    print(summarize(model, args.num_feature))


if __name__ == "__main__":
    main()
