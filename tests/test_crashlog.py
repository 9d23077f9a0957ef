"""Crash logging (the reference's panic hook, main.rs:64)."""

import subprocess
import sys

from bonnie32_tpu import crashlog


def test_format_and_write_report(tmp_path):
    try:
        raise ValueError("boom")
    except ValueError:
        info = sys.exc_info()
    path = str(tmp_path / "crash.log")
    out = crashlog.write_report(*info, path=path)
    text = open(out).read()
    assert "crash report" in text
    assert "ValueError: boom" in text
    assert "test_crashlog" in text          # traceback frames present
    # appends, doesn't truncate
    crashlog.write_report(*info, path=path)
    assert open(out).read().count("crash report") == 2


def test_install_hooks_unhandled_exception(tmp_path):
    """End-to-end: a crashing subprocess leaves a report behind."""
    path = tmp_path / "crash.log"
    code = (
        "import sys; sys.path.insert(0, '.');"
        "from bonnie32_tpu import crashlog;"
        f"crashlog.install({str(repr(str(path)))});"
        "raise RuntimeError('kaboom')"
    )
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, cwd=".")
    assert proc.returncode != 0
    assert "crash report written" in proc.stderr
    text = path.read_text()
    assert "RuntimeError: kaboom" in text
