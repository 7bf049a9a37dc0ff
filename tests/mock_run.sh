#!/bin/bash
# End-to-end CLI sweep on a synthetic dataset (reference: tests/mock_run.sh).
# Usage: bash tests/mock_run.sh  (takes several minutes on a small host)
set -e
export JAX_PLATFORMS=${JAX_PLATFORMS:-cpu}
WORK=$(mktemp -d)
trap "rm -rf $WORK" EXIT

python - <<PY
import numpy as np, h5py, yaml
rng = np.random.RandomState(0)
with h5py.File("$WORK/mock_tvsum.h5", "w") as f:
    for i, n_seq in enumerate([20, 24, 20, 28, 24]):
        n_frames = n_seq * 15
        g = f.create_group(f"video_{i}")
        feats = rng.randn(n_seq, 32).astype(np.float32)
        g["features"] = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
        g["gtscore"] = rng.rand(n_seq).astype(np.float32)
        b = np.linspace(0, n_frames, 11, dtype=np.int32)
        g["change_points"] = np.stack([b[:-1], b[1:] - 1], 1)
        g["n_frame_per_seg"] = b[1:] - b[:-1]
        g["n_frames"] = n_frames
        g["picks"] = np.arange(n_seq, dtype=np.int32) * 15
        g["user_summary"] = (rng.rand(3, n_frames) > 0.8).astype(np.float32)
keys = [f"../datasets/mock_tvsum.h5/video_{i}" for i in range(5)]
yaml.dump([{"train_keys": keys[:4], "test_keys": keys[4:]}],
          open("$WORK/mock.yml", "w"))
PY

COMMON="--splits $WORK/mock.yml --data-root $WORK --max-epoch 2
        --num-feature 32 --num-hidden 8 --fc-depth 2 --num-head 2
        --bucket-size 32 --batch-size 2"

for head in anchor-based anchor-free; do
  for base in attention lstm bilstm gcn linear; do
    echo "=== $head / $base ==="
    python -m edsnet_tpu.train $head --base-model $base \
        --model-dir $WORK/m_${head}_${base} --anchor-scales 4 8 $COMMON
  done
done

for pooling in fft dwt flat-pooling; do
  echo "=== anchor-based / nystromformer / $pooling ==="
  python -m edsnet_tpu.train anchor-based --base-model nystromformer \
      --pooling-type $pooling --anchor-scales 8 \
      --model-dir $WORK/m_pool_$pooling $COMMON
done

python -m edsnet_tpu.make_split --dataset $WORK/mock_tvsum.h5 \
    --save-path $WORK/new_split.yml --num-splits 2 --seed 0
python -m edsnet_tpu.make_shots --dataset $WORK/mock_tvsum.h5
python -m edsnet_tpu.make_shots --dataset $WORK/mock_tvsum.h5 --device-kts
echo "mock run complete"
