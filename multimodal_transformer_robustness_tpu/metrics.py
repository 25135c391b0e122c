"""Evaluation metrics — the public output contract of the robustness sweep.

Numpy ports of reference src/eval_metrics.py:9-68; `eval_mosei_senti` prints
byte-identical keys ("MAE", "Correlation Coefficient", "mult_acc_7",
"mult_acc_5", "F1 score", "Accuracy") so downstream tooling that parses the
reference's JSON-ish blocks keeps working.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def multiclass_acc(preds: np.ndarray, truths: np.ndarray) -> float:
    """Round-and-compare accuracy (reference eval_metrics.py:9-10)."""
    preds = np.asarray(preds)
    truths = np.asarray(truths)
    return float(np.sum(np.round(preds) == np.round(truths)) / float(len(truths)))


def binary_acc(results: np.ndarray, truths: np.ndarray, exclude_zero: bool = True) -> float:
    """Sign-agreement accuracy, optionally excluding zero labels
    (reference eval_metrics.py:17-24)."""
    test_preds = np.asarray(results).reshape(-1)
    test_truth = np.asarray(truths).reshape(-1)
    non_zeros = np.array(
        [i for i, e in enumerate(test_truth) if e != 0 or (not exclude_zero)])
    binary_truth = test_truth[non_zeros] > 0
    binary_preds = test_preds[non_zeros] > 0
    return float(np.mean(binary_truth == binary_preds))


def mosei_multiclass_acc(test_preds: np.ndarray, test_truth: np.ndarray) -> float:
    test_preds = np.asarray(test_preds).reshape(-1)
    test_truth = np.asarray(test_truth).reshape(-1)
    return multiclass_acc(np.clip(test_preds, -3.0, 3.0), np.clip(test_truth, -3.0, 3.0))


def weighted_accuracy(test_preds_emo: np.ndarray, test_truth_emo: np.ndarray) -> float:
    """(reference eval_metrics.py:34-42)"""
    true_label = np.asarray(test_truth_emo) > 0
    predicted_label = np.asarray(test_preds_emo) > 0
    tp = float(np.sum((true_label == 1) & (predicted_label == 1)))
    tn = float(np.sum((true_label == 0) & (predicted_label == 0)))
    p = float(np.sum(true_label == 1))
    n = float(np.sum(true_label == 0))
    return (tp * (n / p) + tn) / (2 * n)


def eval_mosei_senti(results: np.ndarray, truths: np.ndarray,
                     exclude_zero: bool = False, quiet: bool = False) -> Dict[str, float]:
    """MAE / Pearson corr / acc7 / acc5 / weighted F1 / binary accuracy,
    printed in the reference's exact format (eval_metrics.py:44-68).
    Returns the values as a dict as well (the reference only prints)."""
    from sklearn.metrics import accuracy_score, f1_score

    test_preds = np.asarray(results).reshape(-1)
    test_truth = np.asarray(truths).reshape(-1)
    non_zeros = np.array(
        [i for i, e in enumerate(test_truth) if e != 0 or (not exclude_zero)])

    test_preds_a7 = np.clip(test_preds, -3.0, 3.0)
    test_truth_a7 = np.clip(test_truth, -3.0, 3.0)
    test_preds_a5 = np.clip(test_preds, -2.0, 2.0)
    test_truth_a5 = np.clip(test_truth, -2.0, 2.0)

    mae = float(np.mean(np.absolute(test_preds - test_truth)))
    corr = float(np.corrcoef(test_preds, test_truth)[0][1])
    mult_a7 = multiclass_acc(test_preds_a7, test_truth_a7)
    mult_a5 = multiclass_acc(test_preds_a5, test_truth_a5)
    f_score = float(f1_score(test_preds[non_zeros] > 0, test_truth[non_zeros] > 0,
                             average="weighted"))
    acc = float(accuracy_score(test_truth[non_zeros] > 0, test_preds[non_zeros] > 0))

    if not quiet:
        print("\"MAE\": ", mae, ",")
        print("\"Correlation Coefficient\": ", corr, ",")
        print("\"mult_acc_7\": ", mult_a7, ",")
        print("\"mult_acc_5\": ", mult_a5, ",")
        print("\"F1 score\": ", f_score, ",")
        print("\"Accuracy\": ", acc, ",")
    return {"MAE": mae, "Correlation Coefficient": corr, "mult_acc_7": mult_a7,
            "mult_acc_5": mult_a5, "F1 score": f_score, "Accuracy": acc}
