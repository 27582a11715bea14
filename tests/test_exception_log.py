"""Exception log + protected calls (cpl LogException / Protected.h parity)."""

import numpy as np
import pytest

from signalizer_tpu.utils import exception_log as el


@pytest.fixture(autouse=True)
def _isolated_log(tmp_path):
    el.set_exception_log_path(tmp_path / "exceptions.log")
    yield


def test_log_exception_appends_with_traceback():
    try:
        raise ValueError("boom in dsp")
    except ValueError as e:
        el.log_exception("spectrum step failed", e)
    text = el.get_exception_log_path().read_text()
    assert "spectrum step failed" in text
    assert "ValueError: boom in dsp" in text
    assert "Traceback" in text


def test_prune_keeps_newest_half():
    path = el.get_exception_log_path()
    for i in range(200):
        el.log_exception(f"event {i:04d} " + "x" * 64)
    el.check_prune_log(max_bytes=4096)
    text = path.read_text()
    assert len(text.encode()) <= 4096 + 2048  # bounded
    assert "event 0199" in text  # newest survives
    assert "event 0000" not in text  # oldest pruned


def test_protected_call_contains_and_logs():
    from signalizer_tpu.utils.diagnostics import reset_assumptions

    reset_assumptions()
    calls = []

    def bad():
        calls.append(1)
        raise RuntimeError("device OOM")

    out = el.protected_call(bad, fallback=np.zeros(3), context="render")
    np.testing.assert_array_equal(out, np.zeros(3))
    assert "device OOM" in el.get_exception_log_path().read_text()
    # a healthy call passes its value through
    assert el.protected_call(lambda: 42, fallback=0) == 42
