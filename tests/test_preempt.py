"""Preemption-tolerant training: SIGTERM/SIGUSR1 -> one final checkpoint
save + clean stop (utils/preempt.py; no reference equivalent — a
preempted DDP run loses everything since the last save_interval)."""

import contextlib
import os
import signal
from types import SimpleNamespace

from onedc_tpu.utils.preempt import PreemptionGuard


def test_guard_sets_flag_and_restores_handlers():
    old_term = signal.getsignal(signal.SIGTERM)
    old_usr1 = signal.getsignal(signal.SIGUSR1)
    with PreemptionGuard() as g:
        assert not g.triggered
        os.kill(os.getpid(), signal.SIGUSR1)
        assert g.triggered
    assert signal.getsignal(signal.SIGTERM) is old_term
    assert signal.getsignal(signal.SIGUSR1) is old_usr1


def test_trainer_loop_checkpoints_and_stops_on_signal():
    """Drive the REAL Trainer.train loop (stubbed steps, no compiles):
    SIGTERM during step 2 -> exactly one save at step 3, loop exits."""
    from onedc_tpu.train.trainer import Trainer

    tr = Trainer.__new__(Trainer)
    tr.total_steps = 100
    tr.log_interval = 10_000
    tr.save_interval = 10_000
    tr.mesh = contextlib.nullcontext()
    tr.state = SimpleNamespace(step=0)
    tr.train_loader = None
    tr._is_main = True
    tr.train_iter = SimpleNamespace()  # no get_state: loader state n/a
    saves = []
    tr.ckpt = SimpleNamespace(
        save=lambda state, step, metric=None: saves.append((step, metric)))
    tr.writer = SimpleNamespace(flush=lambda: None,
                                log_dict=lambda *a, **k: None)
    steps_run = []

    def one_step(step):
        steps_run.append(step)
        if step == 2:
            os.kill(os.getpid(), signal.SIGTERM)
        return {"total_loss": 0.0, "bpp": 0.0}

    tr.train_one_step = one_step
    tr.train()

    assert steps_run == [0, 1, 2]
    assert saves == [(3, None)]


def test_trainer_loop_no_double_save_when_interval_hits():
    """Signal on a save_interval step: the periodic save already ran, the
    preemption path must not save a second time."""
    from onedc_tpu.train.trainer import Trainer

    tr = Trainer.__new__(Trainer)
    tr.total_steps = 100
    tr.log_interval = 10_000
    tr.save_interval = 2
    tr.mesh = contextlib.nullcontext()
    tr.state = SimpleNamespace(step=0)
    tr.train_loader = None
    tr._is_main = True
    tr.train_iter = SimpleNamespace()
    tr.eval_one_epoch = lambda step: {"total_loss": 1.0}
    saves = []
    tr.ckpt = SimpleNamespace(
        save=lambda state, step, metric=None: saves.append((step, metric)))
    tr.writer = SimpleNamespace(flush=lambda: None,
                                log_dict=lambda *a, **k: None)

    def one_step(step):
        if step == 1:  # step+1 == 2 == save_interval
            os.kill(os.getpid(), signal.SIGTERM)
        return {"total_loss": 0.0, "bpp": 0.0}

    tr.train_one_step = one_step
    tr.train()
    assert saves == [(2, 1.0)]
