"""Metric value + printed-format contract (the reference's JSON-ish blocks
are parsed downstream — eval_metrics.py:63-68)."""

import io
from contextlib import redirect_stdout

import numpy as np
import pytest

from multimodal_transformer_robustness_tpu.metrics import (
    binary_acc,
    eval_mosei_senti,
    mosei_multiclass_acc,
    multiclass_acc,
    weighted_accuracy,
)


def test_multiclass_acc():
    assert multiclass_acc(np.array([1.2, 2.6, 0.4]), np.array([1, 3, 1])) == \
        pytest.approx(2 / 3)


def test_binary_acc_excludes_zero_labels():
    preds = np.array([0.5, -0.5, 0.9, -0.1])
    truth = np.array([1.0, -1.0, 0.0, 2.0])
    # zero-label row 2 excluded; rows 0,1 correct; row 3 wrong
    assert binary_acc(preds, truth, exclude_zero=True) == pytest.approx(2 / 3)
    assert binary_acc(preds, truth, exclude_zero=False) == pytest.approx(0.5)


def test_weighted_accuracy():
    preds = np.array([1.0, -1.0, 1.0, -1.0])
    truth = np.array([1.0, -1.0, -1.0, 1.0])
    # tp=1, tn=1, p=2, n=2 -> (1*(2/2)+1)/(2*2) = 0.5
    assert weighted_accuracy(preds, truth) == pytest.approx(0.5)


def test_mosei_multiclass_clips_to_pm3():
    preds = np.array([5.0, -4.0])
    truth = np.array([3.0, -3.0])
    assert mosei_multiclass_acc(preds, truth) == 1.0


def test_eval_mosei_senti_printed_format():
    rng = np.random.default_rng(0)
    preds = rng.standard_normal(64)
    truth = rng.standard_normal(64)
    buf = io.StringIO()
    with redirect_stdout(buf):
        vals = eval_mosei_senti(preds, truth, exclude_zero=False)
    out = buf.getvalue()
    # byte-level key contract of the reference print block
    for key in ('"MAE": ', '"Correlation Coefficient": ', '"mult_acc_7": ',
                '"mult_acc_5": ', '"F1 score": ', '"Accuracy": '):
        assert key in out, out
    assert all(np.isfinite(v) for v in vals.values())
    # MAE agrees with a direct computation
    assert vals["MAE"] == pytest.approx(np.mean(np.abs(preds - truth)))
    # quiet mode prints nothing
    buf2 = io.StringIO()
    with redirect_stdout(buf2):
        eval_mosei_senti(preds, truth, quiet=True)
    assert buf2.getvalue() == ""
