"""EDSNet-TPU: a TPU-native (JAX/XLA/Pallas/pjit) video-summarization framework.

A ground-up rebuild of the capabilities of
``ashish2506prasad/EDSNet-Efficient-DSNet-for-Video-Summarization``:
anchor-based / anchor-free temporal interest-proposal detection over frame
features, with an efficient token-mixing backbone zoo (attention, LSTM/BiLSTM,
GCN, Nystromformer, Performer, Linformer, FNet, DWT) and efficient region
poolings (ROI / flat / FFT / DWT), plus KTS shot segmentation, 0/1 knapsack
keyshot selection, NMS, and the full train/evaluate/infer tooling.

Design stance (vs the reference, see SURVEY.md):
- one functional core: pure ``fn(params, batch) -> preds/losses`` under jit
- label generation, NMS, knapsack, and KTS are jittable device ops
- batches are padded, masked buckets of videos sharded over a device mesh
  (the reference is a batch-size-1 python loop)
- native C++ host kernels (knapsack branch&bound, KTS DP) back the host-side
  preprocessing path, with pure-numpy fallbacks.
"""

__version__ = "0.1.0"
