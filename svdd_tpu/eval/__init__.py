"""Evaluation suite: streaming metrics, distributional distances,
reward-quantile reports."""

from svdd_tpu.eval import metrics  # noqa: F401
