"""core/tpu_flags: tuned-flag application is idempotent, opt-out-able,
never overrides user-set values, and keys the compile cache by flag set."""

import os

from msml_tpu.core.tpu_flags import (TUNED_FLAGS, apply_tuned_flags,
                                     flag_cache_dir)


def test_apply_and_idempotent(monkeypatch):
    monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)
    monkeypatch.delenv("MSML_NO_TUNED_FLAGS", raising=False)
    v1 = apply_tuned_flags()
    assert all(f in v1 for f in TUNED_FLAGS)
    v2 = apply_tuned_flags()
    assert v1 == v2 == os.environ["LIBTPU_INIT_ARGS"]


def test_opt_out(monkeypatch):
    monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)
    monkeypatch.setenv("MSML_NO_TUNED_FLAGS", "1")
    assert apply_tuned_flags() == ""
    assert "LIBTPU_INIT_ARGS" not in os.environ


def test_user_value_wins(monkeypatch):
    user = TUNED_FLAGS[0].split("=", 1)[0] + "=false"
    monkeypatch.setenv("LIBTPU_INIT_ARGS", user)
    monkeypatch.delenv("MSML_NO_TUNED_FLAGS", raising=False)
    assert apply_tuned_flags() == user


def test_flag_cache_dir(monkeypatch):
    monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)
    assert flag_cache_dir("/tmp/x") == "/tmp/x"
    monkeypatch.setenv("LIBTPU_INIT_ARGS", "--a=1")
    d1 = flag_cache_dir("/tmp/x")
    monkeypatch.setenv("LIBTPU_INIT_ARGS", "--a=2")
    d2 = flag_cache_dir("/tmp/x")
    assert d1 != d2 and d1.startswith("/tmp/x_")


def test_longer_flag_name_does_not_suppress(monkeypatch):
    """A user flag whose NAME merely extends the tuned one must not
    suppress it (presence is checked per whitespace token, not by
    substring)."""
    other = TUNED_FLAGS[0].split("=", 1)[0] + "_v2=true"
    monkeypatch.setenv("LIBTPU_INIT_ARGS", other)
    monkeypatch.delenv("MSML_NO_TUNED_FLAGS", raising=False)
    v = apply_tuned_flags()
    assert other in v.split() and TUNED_FLAGS[0] in v.split()
