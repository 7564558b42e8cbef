"""Error-system tests (the reference's error.rs carries 19 unit tests —
SURVEY §4) plus obs coverage."""

import json
import logging
import time

import pytest

from audioflow_tpu.errors import (
    AudioError,
    AudioFlowError,
    ConfigError,
    ErrorCode,
    IOError_,
    RecoveryStrategy,
    RetryPolicy,
    SessionError,
    SinkError,
    with_retry,
)
from audioflow_tpu.obs import RunMetrics, Timer, get_logger, profile_trace, setup_logging


# ------------------------------------------------------------------ errors

def test_domain_defaults():
    """Each domain error carries its own default code + strategy (error.rs:8-69)."""
    assert AudioError("x").code is ErrorCode.RESAMPLING_FAILED
    assert IOError_("x").code is ErrorCode.DECODE_FAILED
    assert SinkError("x").code is ErrorCode.SINK_WRITE_FAILED
    assert ConfigError("x").code is ErrorCode.CONFIG_VALIDATION_ERROR
    assert SessionError("x").code is ErrorCode.SESSION_STATE_INVALID


def test_recoverability_matches_reference_policy():
    """Only transient-I/O errors are recoverable (error.rs:229-235)."""
    assert IOError_("transient").is_recoverable
    assert not AudioError("bad").is_recoverable
    assert not ConfigError("bad").is_recoverable
    assert not SinkError("bad").is_recoverable  # FALLBACK, not retry


def test_code_override():
    e = IOError_("401", code=ErrorCode.AUTHENTICATION_FAILED, strategy=RecoveryStrategy.USER_ACTION)
    assert e.code is ErrorCode.AUTHENTICATION_FAILED and not e.is_recoverable


def test_error_codes_are_screaming_snake():
    """ErrorCode Display parity (error.rs:71-92)."""
    for code in ErrorCode:
        assert code.value == code.value.upper()
        assert " " not in code.value


def test_errors_are_exceptions():
    with pytest.raises(AudioFlowError):
        raise AudioError("boom")
    try:
        raise SessionError("closed", code=ErrorCode.SESSION_CLOSED)
    except AudioFlowError as e:
        assert e.message == "closed"


def test_retry_policy_backoff_schedule():
    p = RetryPolicy(max_attempts=5, base_delay_s=0.1, multiplier=2.0, max_delay_s=0.5)
    assert [p.delay_for(i) for i in range(5)] == [0.1, 0.2, 0.4, 0.5, 0.5]


def test_with_retry_no_sleep_for_immediate():
    calls = []

    def fn():
        calls.append(1)
        if len(calls) < 2:
            raise IOError_("x", strategy=RecoveryStrategy.RETRY_IMMEDIATE)
        return "ok"

    slept = []
    assert with_retry(fn, RetryPolicy(base_delay_s=9), sleep=slept.append) == "ok"
    assert slept == []  # RETRY_IMMEDIATE never sleeps


def test_with_retry_raises_non_recoverable():
    def fn():
        raise AudioError("fatal-ish")

    with pytest.raises(AudioError):
        with_retry(fn, RetryPolicy(max_attempts=3))


def test_with_retry_exhausts():
    calls = []

    def fn():
        calls.append(1)
        raise IOError_("always")

    with pytest.raises(IOError_):
        with_retry(fn, RetryPolicy(max_attempts=3, base_delay_s=0), sleep=lambda s: None)
    assert len(calls) == 3


# --------------------------------------------------------------------- obs

def test_timer():
    with Timer() as t:
        time.sleep(0.01)
    assert t.elapsed >= 0.009


def test_run_metrics_dict():
    m = RunMetrics(audio_seconds=100.0, wall_seconds=2.0, n_devices=4)
    d = m.to_dict()
    assert d["realtime_factor"] == 50.0
    assert d["realtime_factor_per_chip"] == 12.5
    assert RunMetrics().realtime_factor == 0.0  # no div-by-zero


def test_profile_trace_noop_and_dir(tmp_path):
    with profile_trace(None):
        pass
    with profile_trace(str(tmp_path / "trace")):
        pass  # must not raise even if profiler unsupported


def test_logging_setup(tmp_path, capsys):
    log_file = tmp_path / "af.log"
    setup_logging("debug", str(log_file))
    get_logger("t").debug("hello-debug")
    assert "hello-debug" in log_file.read_text()
    setup_logging("warning")
    get_logger("t").info("not-shown")
    root = logging.getLogger("audioflow")
    assert root.level == logging.WARNING
