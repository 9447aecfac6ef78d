"""Error taxonomy and retry tests."""

import pytest

from framewright_tpu.errors import (
    ErrorReport,
    FatalError,
    FramewrightError,
    HBMError,
    InputError,
    RetryPolicy,
    TransientError,
    classify_error,
    is_transient,
    with_retry,
)


class TestClassification:
    def test_oom_is_hbm_transient(self):
        err = classify_error(RuntimeError("RESOURCE EXHAUSTED: Out of memory allocating 4.2G"))
        assert isinstance(err, HBMError)
        assert isinstance(err, TransientError)

    def test_missing_file(self):
        err = classify_error(FileNotFoundError("No such file or directory: x.mp4"))
        assert isinstance(err, InputError)
        assert isinstance(err, FatalError)

    def test_passthrough(self):
        original = HBMError("boom")
        assert classify_error(original) is original

    def test_unknown_maps_to_base(self):
        err = classify_error(ValueError("weird"))
        assert type(err) is FramewrightError
        assert err.details["original_type"] == "ValueError"

    def test_is_transient(self):
        assert is_transient(RuntimeError("connection timed out"))
        assert not is_transient(ValueError("nope"))


class TestRetry:
    def test_retries_transient_then_succeeds(self):
        calls = {"n": 0}

        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise TransientError("try again")
            return "ok"

        pol = RetryPolicy(max_attempts=5, base_delay=0.0, jitter=0.0)
        assert pol.run(flaky) == "ok"
        assert calls["n"] == 3

    def test_fatal_not_retried(self):
        calls = {"n": 0}

        def fatal():
            calls["n"] += 1
            raise FatalError("dead")

        with pytest.raises(FatalError):
            RetryPolicy(max_attempts=5, base_delay=0.0).run(fatal)
        assert calls["n"] == 1

    def test_exhausted_raises(self):
        with pytest.raises(TransientError):
            RetryPolicy(max_attempts=2, base_delay=0.0).run(
                lambda: (_ for _ in ()).throw(TransientError("always"))
            )

    def test_on_retry_hook_for_tile_downshift(self):
        seen = []

        def hbm_hungry():
            if len(seen) < 2:
                raise HBMError("oom")
            return "fit"

        pol = RetryPolicy(
            max_attempts=4, base_delay=0.0,
            on_retry=lambda attempt, err: seen.append(type(err).__name__),
        )
        assert pol.run(hbm_hungry) == "fit"
        assert seen == ["HBMError", "HBMError"]

    def test_decorator(self):
        state = {"n": 0}

        @with_retry(RetryPolicy(max_attempts=3, base_delay=0.0))
        def fn():
            state["n"] += 1
            if state["n"] == 1:
                raise TransientError("once")
            return 42

        assert fn() == 42


class TestErrorReport:
    def test_aggregation(self):
        rep = ErrorReport()
        rep.record(HBMError("oom"), stage="sr", frame=3)
        rep.record(ValueError("x"), stage="sr", frame=4)
        rep.record(HBMError("oom2"), stage="denoise")
        assert rep.count == 3
        s = rep.summary()
        assert s["by_type"]["HBMError"] == 2
        assert s["total"] == 3
