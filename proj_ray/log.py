"""Logger hook (the reference's pj_log / pj_set_ctx logger surface,
src/pj_log.c + src/proj_api.h:127): a process-level pluggable logging
callback with the reference's level taxonomy.  Library code emits
through ``pj_log``; applications install their own sink with
``set_logger`` (the default mirrors pj_stderr_logger: errors always,
debug levels gated by ``set_log_level`` / $PROJ_DEBUG).

Worker note: the hook is per-process state — in Ray Data each worker
process starts with the default stderr logger; install custom sinks in
an actor's ``__init__`` when a stage needs one.
"""

from __future__ import annotations

import os
import sys

PJ_LOG_NONE = 0
PJ_LOG_ERROR = 1
PJ_LOG_DEBUG_MAJOR = 2
PJ_LOG_DEBUG_MINOR = 3


def _stderr_logger(app_data, level: int, msg: str) -> None:
    """pj_stderr_logger prints the raw message (src/pj_log.c:37-41);
    the C pj_log gates EVERY level — errors included — behind
    ctx->debug_level (src/pj_log.c:53-54), so the default process is
    silent until set_log_level / $PROJ_DEBUG raises the gate.  (The
    hook itself still receives errors so custom sinks can capture
    them; only the default stderr sink applies the C's gate.)"""
    if _LOG_LEVEL >= level:
        print(msg, file=sys.stderr)


_LOGGER = _stderr_logger
_APP_DATA = None
_LOG_LEVEL = PJ_LOG_NONE
if os.environ.get("PROJ_DEBUG"):  # pj_init.c picks this up the same way
    try:
        _LOG_LEVEL = int(os.environ["PROJ_DEBUG"])
    except ValueError:
        _LOG_LEVEL = PJ_LOG_DEBUG_MAJOR


def set_logger(fn, app_data=None) -> None:
    """Install a logging callback ``fn(app_data, level, msg)``
    (pj_ctx_set_logger + pj_ctx_set_app_data).  ``None`` restores the
    stderr default."""
    global _LOGGER, _APP_DATA
    _LOGGER = fn or _stderr_logger
    _APP_DATA = app_data


def set_log_level(level: int) -> int:
    """Set the debug gate (pj_ctx_set_debug); returns the old level."""
    global _LOG_LEVEL
    old = _LOG_LEVEL
    _LOG_LEVEL = int(level)
    return old


def pj_log(level: int, msg: str) -> None:
    """Emit through the installed hook (pj_log, src/pj_log.c:57-76)."""
    if level > PJ_LOG_ERROR and level > _LOG_LEVEL:
        return
    _LOGGER(_APP_DATA, level, msg)
