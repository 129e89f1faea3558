"""CLI --ckpt save + resume roundtrip (cli._maybe_resume + _ckpt_step).

Closes the preemption loop: a SIGTERM'd run leaves the in-flight epoch's
checkpoint on disk (utils.PreemptionWatcher), and the rerun continues
after it instead of restarting from scratch.
"""

import io
import contextlib

import jax

jax.config.update("jax_platforms", "cpu")


def _run(argv):
    from video_mamba_suite_tpu.cli import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(argv)
    return buf.getvalue()


def test_cli_tas_resume_roundtrip(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    first = _run(["tas", "--synthetic", "--epochs", "1", "--ckpt", ckpt])
    assert "epoch 0:" in first and "[resume]" not in first

    second = _run(["tas", "--synthetic", "--epochs", "2", "--ckpt", ckpt])
    assert "[resume] restored epoch 0" in second
    assert "epoch 0:" not in second  # continued, not restarted
    assert "epoch 1:" in second
