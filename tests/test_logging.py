"""MetricLogger / SmoothedValue behavior (libs/utils.py:18-161 capability)."""

import numpy as np

from mvlt_tpu.utils.logging import MetricLogger, SmoothedValue


def test_smoothed_value_stats():
    v = SmoothedValue(window_size=3)
    for x in (1.0, 2.0, 3.0, 4.0):
        v.update(x)
    assert v.window.maxlen == 3
    assert v.value == 4.0
    assert v.median == 3.0
    assert v.avg == 3.0
    assert v.global_avg == 2.5
    assert v.max == 4.0


def test_weighted_global_avg():
    v = SmoothedValue()
    v.update(1.0, n=3)
    v.update(5.0, n=1)
    assert v.global_avg == (3.0 + 5.0) / 4


def test_metric_logger_log_every(capsys):
    logger = MetricLogger()
    items = list(range(25))
    out = []
    for i in logger.log_every(items, print_freq=10, header="T:"):
        logger.update(loss=float(i))
        out.append(i)
    assert out == items
    printed = capsys.readouterr().out
    assert "T: [0/25]" in printed
    assert "eta:" in printed
    assert "done in" in printed
    assert logger.global_averages()["loss"] == np.mean(items)


def test_sync_noop_single_process():
    logger = MetricLogger()
    logger.update(x=2.0)
    logger.synchronize_between_processes()
    assert logger.global_averages()["x"] == 2.0


def test_quiet_when_not_main(capsys):
    logger = MetricLogger(is_main=False)
    for _ in logger.log_every(range(5), 1):
        pass
    assert capsys.readouterr().out == ""
