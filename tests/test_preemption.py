"""Preemption-safe checkpointing (utils/preemption.py).

Beyond-reference recovery: the reference's story is SLURM kill + resume
from the last epoch checkpoint (SURVEY.md §5); here a latched SIGTERM
triggers a synchronous save of the CURRENT step.
"""

import os
import signal

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from video_mamba_suite_tpu.utils import PreemptionWatcher
from video_mamba_suite_tpu.utils.trainer import TrainerCore


def test_watcher_latches_sigterm():
    with PreemptionWatcher() as w:
        assert not w.preempted
        os.kill(os.getpid(), signal.SIGTERM)
        assert w.preempted
    # handler restored: a second watcher starts clean
    with PreemptionWatcher() as w2:
        assert not w2.preempted


def test_save_if_needed_periodic_and_preempt(tmp_path):
    core = TrainerCore()
    state = {"params": {"w": jnp.arange(4.0)}, "step": jnp.asarray(0)}
    d = str(tmp_path / "ckpt")
    with PreemptionWatcher() as w:
        # periodic save at step 0 (0 % 2 == 0), none at step 1
        assert w.save_if_needed(core, d, 0, state, every=2) is False
        assert core.latest_step(d) == 0
        assert w.save_if_needed(core, d, 1, state, every=2) is False
        assert core.latest_step(d) == 0
        # preemption: saves the CURRENT (off-schedule) step and returns True
        os.kill(os.getpid(), signal.SIGTERM)
        state["step"] = jnp.asarray(7)
        assert w.save_if_needed(core, d, 7, state, every=2) is True
        assert core.latest_step(d) == 7
    restored = core.restore(d, state)
    assert int(restored["step"]) == 7


def test_cli_ckpt_step_polls_watcher():
    from video_mamba_suite_tpu import cli

    class FakeTrainer:
        saves = []

        def save(self, ckpt, ep):
            self.saves.append((ckpt, ep))

    tr = FakeTrainer()
    assert cli._ckpt_step(tr, None, 0) is False          # no watcher, no dir
    with PreemptionWatcher() as w:
        cli._WATCHER = w
        try:
            assert cli._ckpt_step(tr, "/tmp/x", 1) is False
            assert tr.saves == [("/tmp/x", 1)]
            os.kill(os.getpid(), signal.SIGTERM)
            assert cli._ckpt_step(tr, "/tmp/x", 2) is True  # stop + saved
            assert tr.saves[-1] == ("/tmp/x", 2)
        finally:
            cli._WATCHER = None
