"""Crash logging: unhandled-exception reports with backtraces.

The Python counterpart of the reference's panic hook
(`/root/reference/src/main.rs:64` — the `crashlog` crate writes a crash
report with a backtrace when the process panics).  `install()` hooks
`sys.excepthook` (and threading's) to append a timestamped report —
app metadata, exception, traceback, platform — to a crash file, then
chains to the previous hook.
"""

import datetime
import io
import os
import platform
import sys
import threading
import traceback
from typing import Optional

APP_NAME = "Bonnie32-TPU"

_prev_hook = None
_log_path: Optional[str] = None


def default_log_path() -> str:
    base = os.environ.get("XDG_STATE_HOME") \
        or os.path.expanduser("~/.local/state")
    return os.path.join(base, "bonnie-32", "crash.log")


def format_report(exc_type, exc, tb, app_name: str = APP_NAME) -> str:
    buf = io.StringIO()
    now = datetime.datetime.now().isoformat(timespec="seconds")
    buf.write(f"==== {app_name} crash report ====\n")
    buf.write(f"time: {now}\n")
    buf.write(f"python: {platform.python_version()} "
              f"({platform.platform()})\n")
    buf.write(f"thread: {threading.current_thread().name}\n")
    buf.write("".join(traceback.format_exception(exc_type, exc, tb)))
    buf.write("=" * 34 + "\n")
    return buf.getvalue()


def write_report(exc_type, exc, tb, path: Optional[str] = None) -> str:
    path = path or _log_path or default_log_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    report = format_report(exc_type, exc, tb)
    with open(path, "a") as f:
        f.write(report)
    return path


def install(path: Optional[str] = None) -> None:
    """Hook unhandled exceptions (main thread + threading) to the crash
    file; chains to the pre-existing hook afterwards."""
    global _prev_hook, _log_path
    _log_path = path or default_log_path()
    if _prev_hook is not None:       # already installed
        return
    _prev_hook = sys.excepthook

    def hook(exc_type, exc, tb):
        try:
            where = write_report(exc_type, exc, tb)
            print(f"{APP_NAME}: crash report written to {where}",
                  file=sys.stderr)
        except OSError:
            pass
        (_prev_hook or sys.__excepthook__)(exc_type, exc, tb)

    sys.excepthook = hook

    def thread_hook(args):
        if args.exc_type is SystemExit:
            return
        try:
            write_report(args.exc_type, args.exc_value, args.exc_traceback)
        except OSError:
            pass

    threading.excepthook = thread_hook


def uninstall() -> None:
    global _prev_hook
    if _prev_hook is not None:
        sys.excepthook = _prev_hook
        _prev_hook = None
