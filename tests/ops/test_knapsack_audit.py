"""Knapsack tie-selection audit (evaluate-time DP vs C++ B&B comparison).

Both solvers are value-exact (tests/ops/test_knapsack_fuzz.py), but tied
optima admit multiple selections and tie flips change summaries — the
audit measures that on real videos (reference budget: paper F +-0.5,
vsumm_helper.py:26-45).
"""
import numpy as np
import pytest

from edsnet_tpu.data.dataset import VideoRecord
from edsnet_tpu.evaluate import KnapsackAudit
from edsnet_tpu.native import load as native_load
from edsnet_tpu.ops import summary as summ_ops
from edsnet_tpu.ops.knapsack import knapsack


def _record(n_seq=20, n_frames=300, seed=0):
    rng = np.random.RandomState(seed)
    # many short segments so the 15% budget can actually pack a few
    bounds = np.linspace(0, n_frames, 16, dtype=np.int32)
    return VideoRecord(
        key="../d/tvsum.h5/video_0",
        seq=rng.randn(n_seq, 8).astype(np.float32),
        gtscore=rng.rand(n_seq).astype(np.float32),
        cps=np.stack([bounds[:-1], bounds[1:] - 1], 1),
        n_frames=n_frames,
        nfps=bounds[1:] - bounds[:-1],
        picks=np.arange(n_seq, dtype=np.int32) * 15,
        user_summary=(rng.rand(3, n_frames) > 0.8).astype(np.float32))


def test_forced_solvers_agree_on_value():
    """dp and bnb forced modes both return an optimal-value selection."""
    if native_load() is None:
        pytest.skip("native extension unavailable")
    rng = np.random.RandomState(1)
    for _ in range(50):
        n = int(rng.randint(3, 12))
        values = rng.randint(1, 6, n)  # small range -> many ties
        weights = rng.randint(1, 6, n)
        cap = int(rng.randint(3, 15))
        sel_dp = knapsack(values, weights, cap, solver="dp")
        sel_bnb = knapsack(values, weights, cap, solver="bnb")
        assert sum(values[i] for i in sel_dp) == \
            sum(values[i] for i in sel_bnb)
        assert sum(weights[i] for i in sel_dp) <= cap
        assert sum(weights[i] for i in sel_bnb) <= cap


def test_unknown_solver_rejected():
    with pytest.raises(ValueError):
        knapsack([1], [1], 1, solver="ortools")


def test_audit_counts_divergence(monkeypatch):
    """A tie flip (different selections, equal value) is counted with its
    F impact; identical selections are not."""
    if native_load() is None:
        pytest.skip("native extension unavailable")
    audit = KnapsackAudit()
    record = _record()
    kept_cls = np.array([0.9, 0.5], np.float32)
    kept_boxes = np.array([[0, 8], [10, 18]], np.int32)
    pred_summ = summ_ops.bbox2summary(
        record.seq.shape[0], kept_cls, kept_boxes, record.cps,
        record.n_frames, record.nfps, record.picks)

    # same selection both ways -> no divergence
    audit.check(record, kept_cls, kept_boxes, "avg", pred_summ)
    assert (audit.n_videos, audit.n_diverged) == (1, 0)

    # force a tie flip: dp picks shot 0, bnb picks shot 1
    real_knapsack = summ_ops.knapsack

    def flipped(values, weights, capacity, solver="auto"):
        if solver == "bnb":
            sel = real_knapsack(values, weights, capacity, solver="dp")
            return [i + 1 for i in sel if i + 1 < len(values)] or sel
        return real_knapsack(values, weights, capacity, solver=solver)

    monkeypatch.setattr(summ_ops, "knapsack", flipped)
    audit.check(record, kept_cls, kept_boxes, "avg", pred_summ)
    assert (audit.n_videos, audit.n_diverged) == (2, 1)
    assert len(audit.abs_df) == 1 and audit.abs_df[0] >= 0.0
    assert "1/2 videos diverged" in audit.report()


def test_audit_unavailable_reports_skip(monkeypatch):
    import edsnet_tpu.evaluate as eval_mod
    monkeypatch.setattr(eval_mod, "_native_load", lambda: None)
    audit = KnapsackAudit()
    audit.check(_record(), np.array([0.9]), np.array([[0, 8]]), "avg",
                np.zeros(300, bool))
    assert audit.n_videos == 0
    assert "unavailable" in audit.report()


def test_evaluate_passes_audit_through(tmp_path):
    """Host evaluate() feeds every scored video through the audit."""
    if native_load() is None:
        pytest.skip("native extension unavailable")
    import jax

    from edsnet_tpu.evaluate import evaluate
    from edsnet_tpu.models.model_zoo import get_model

    feat = 8
    model = get_model(
        "anchor-based", model_depth="shallow", base_model="linear",
        num_feature=feat, num_hidden=8, anchor_scales=(4,), num_head=2,
        fc_depth=1, attention_depth=1, encoder_type="classic",
        orientation="paper", pooling_type="roi")
    records = [_record(n_seq=18, n_frames=270, seed=s) for s in range(3)]
    x = np.zeros((1, 32, feat), np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)}, x, np.ones((1, 32), bool))

    audit = KnapsackAudit()
    fscore, diversity = evaluate(model, variables, records, nms_thresh=0.5,
                                 batch_size=2, bucket_size=32,
                                 knapsack_audit=audit)
    assert audit.n_videos == 3
    assert 0.0 <= fscore <= 1.0
    assert "3 videos" in audit.report() or "/3" in audit.report()
