"""Worker process for the multi-host (multi-process) smoke test.

Launched by test_multihost.py with JAX_COORDINATOR_ADDRESS /
JAX_NUM_PROCESSES / JAX_PROCESS_ID set and 2 virtual CPU devices per
process.  Joins the cluster through ``setup_runtime`` (the production code
path, `edsnet_tpu/utils/runtime.py`), builds the global ``('data',)`` mesh
spanning both processes, and runs one real ``ab_train_step`` on a
deterministic batch read from the shared mock h5.  The parent compares the
resulting loss and parameter checksum against a single-process run of the
same step.
"""
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def run_step(work: str, mesh_size: int = 4):
    """One deterministic ab_train_step over a ``mesh_size``-device mesh.

    Works identically in single-process (parent baseline) and
    multi-process (worker) mode: host values are deterministic, and
    ``make_array_from_callback`` assembles global arrays either way.
    """
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from edsnet_tpu.data import batching
    from edsnet_tpu.data.dataset import VideoDataset, load_yaml
    from edsnet_tpu.models.model_zoo import get_model
    from edsnet_tpu.parallel.steps import (TrainState, ab_train_step,
                                           make_optimizer)

    split = load_yaml(Path(work) / "mock.yml")[0]
    ds = VideoDataset(split["train_keys"], work)
    items = batching.prepare_items(ds, "anchor-based", anchor_scales=(4,),
                                   pos_iou=0.6, neg_iou=0.0, inc_iou=0.3,
                                   bucket_size=32)
    batch = next(batching.batch_items(items, 4, 32, shuffle=False,
                                      pad_batch_to=4))
    batch = {k: np.asarray(v) for k, v in batch.items()
             if isinstance(v, np.ndarray)}

    model = get_model("anchor-based", model_depth="shallow",
                      base_model="linear", num_feature=16, num_hidden=8,
                      num_head=2, fc_depth=1, anchor_scales=(4,),
                      orientation="paper", pooling_type="roi",
                      encoder_type="classic", attention_depth=1)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    # init locally (deterministic, identical on every process), pull to
    # host numpy, then assemble global arrays explicitly
    host_vars = jax.device_get(
        model.init(rngs, jnp.asarray(batch["seq"]),
                   jnp.asarray(batch["mask"])))

    mesh = Mesh(np.asarray(jax.devices()[:mesh_size]), ("data",))
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    def to_global(x, sharding):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])

    params = jax.tree.map(lambda x: to_global(x, rep),
                          host_vars["params"])
    constants = {k: jax.tree.map(lambda x: to_global(x, rep), v)
                 for k, v in host_vars.items() if k != "params"}
    batch_g = {k: to_global(v, shard) for k, v in batch.items()}

    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=make_optimizer(1e-3, 0.0),
                              constants=constants)
    # numpy inputs to jit are treated as identical-on-all-processes and
    # replicated; PRNGKey(2) is the legacy uint32[2] key
    step_rng = np.asarray(jax.random.PRNGKey(2))
    state, metrics = ab_train_step(state, batch_g, step_rng,
                                   lambda_reg=1.0, neg_ratio=2.0,
                                   inc_ratio=1.0)
    loss = float(metrics["loss"])
    checksum = float(sum(
        np.abs(np.asarray(jax.device_get(p))).sum()
        for p in jax.tree.leaves(state.params)))
    return {"loss": loss, "checksum": checksum}


def main():
    work, out_path = sys.argv[1], sys.argv[2]

    from edsnet_tpu.utils.runtime import setup_runtime
    setup_runtime("cpu")

    info = {
        "process_count": jax.process_count(),
        "process_index": jax.process_index(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
    }
    info.update(run_step(work, mesh_size=4))
    Path(out_path).write_text(json.dumps(info))


if __name__ == "__main__":
    main()
