"""LRSchedule must reproduce the reference's LRWarmup factor math exactly
(``sykepic/train/network.py:98-130``) and the post-warmup plateau reduction
(``train.py:155-163,310-312``)."""

import pytest

from sykepic_tpu.train.trainer import LRSchedule

WARMUP = dict(factor_1=0.1, factor_2=0.5, step_1=4, step_2=14, step_3=24)


def advance(s, epoch):
    s.start_epoch(epoch)


def test_warmup_stages_and_factors():
    s = LRSchedule(0.01, warmup=WARMUP)
    assert s.lrs == [0.01, 0.0, 0.0] and s.stage == 0
    for e in range(1, 4):
        advance(s, e)
        assert s.lrs[0] == 0.01
    advance(s, 4)  # step_1: head lr *= f1
    assert s.lrs[0] == pytest.approx(0.001)
    assert s.stage == 0
    advance(s, 14)  # step_2: group1 = head*f1 BEFORE head *= f2
    assert s.lrs[1] == pytest.approx(0.001 * 0.1)
    assert s.lrs[0] == pytest.approx(0.001 * 0.5)
    assert s.stage == 1
    advance(s, 24)  # step_3: group2 = group1*f1; head *= f2; group1 unchanged
    assert s.lrs[2] == pytest.approx(0.0001 * 0.1)
    assert s.lrs[1] == pytest.approx(0.0001)
    assert s.lrs[0] == pytest.approx(0.0005 * 0.5)
    assert s.stage == 2


def test_plateau_counts_only_after_warmup():
    s = LRSchedule(0.01, warmup=WARMUP, reduction=dict(factor=0.1, patience=2))
    for e in range(1, 25):
        s.start_epoch(e)
    lrs_after_warmup = list(s.lrs)
    # during warmup epochs, end_epoch is a no-op for the plateau counter
    for e in range(1, 25):
        s.end_epoch(e, val_loss=1.0)
    assert s.lrs == lrs_after_warmup
    # after step_3: patience=2 -> reduce on the 3rd non-improving epoch
    s.end_epoch(25, 1.0)   # sets best
    s.end_epoch(26, 1.0)   # bad 1
    s.end_epoch(27, 1.0)   # bad 2
    assert s.lrs == lrs_after_warmup
    s.end_epoch(28, 1.0)   # bad 3 > patience -> reduce all groups
    assert s.lrs == pytest.approx([lr * 0.1 for lr in lrs_after_warmup])
    # improvement resets the counter
    s.end_epoch(29, 0.5)
    s.end_epoch(30, 0.51)
    s.end_epoch(31, 0.51)
    before = list(s.lrs)
    s.end_epoch(32, 0.49)  # improvement clears the two bad epochs
    s.end_epoch(33, 0.49)
    assert s.lrs == before


def test_no_warmup_no_stage_changes():
    s = LRSchedule(0.01)
    for e in range(1, 100):
        s.start_epoch(e)
        s.end_epoch(e, 1.0)
    assert s.stage == 0
    assert s.lrs == [0.01, 0.0, 0.0]


def test_plateau_without_warmup_counts_immediately():
    s = LRSchedule(0.01, reduction=dict(factor=0.5, patience=0))
    s.end_epoch(1, 1.0)
    s.end_epoch(2, 1.0)  # bad 1 > patience 0 -> reduce
    assert s.lrs[0] == pytest.approx(0.005)
