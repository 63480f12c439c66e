"""ANSI-colored status logger.

Capability parity with the reference's logger
(/root/reference/src/flowbyte/log.py:4-45): leveled, color-coded progress
messages with an optional in-place (carriage-return) update mode used by
chunked readers to repaint a progress line.  Re-designed here on top of the
stdlib rather than translated.
"""

from __future__ import annotations

import sys

_COLORS = {
    "info": "\033[94m",      # blue
    "success": "\033[92m",   # green
    "warning": "\033[93m",   # yellow
    "error": "\033[91m",     # red
    "progress": "\033[96m",  # cyan
}
_RESET = "\033[0m"


def _emit(level: str, message: str, *, inplace: bool = False) -> None:
    color = _COLORS.get(level, "")
    end = "\r" if inplace else "\n"
    stream = sys.stderr
    if stream.isatty():
        stream.write(f"{color}{message}{_RESET}{end}")
    else:
        stream.write(f"{message}{end}")
    stream.flush()


def info(message: str) -> None:
    _emit("info", message)


def success(message: str) -> None:
    _emit("success", message)


def warning(message: str) -> None:
    _emit("warning", message)


def error(message: str) -> None:
    _emit("error", message)


def progress(message: str, *, inplace: bool = True) -> None:
    """Repaint a progress line in place (the reference rewrites the cursor
    line during chunked fetch, sql.py:146-156)."""
    _emit("progress", message, inplace=inplace)
