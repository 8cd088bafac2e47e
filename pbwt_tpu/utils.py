"""Logging / timing utilities (reference utils.c timeUpdate, logFile)."""

from __future__ import annotations

import resource
import sys
import time

log_file = sys.stderr


def set_log_file(f) -> None:
    global log_file
    log_file = f


def log(msg: str) -> None:
    print(msg, file=log_file)
    log_file.flush()


_last_user = 0.0
_last_sys = 0.0
_last_rss = 0
_last_wall = time.time()


def time_update(file=None) -> None:
    """Per-stage resource report, analogous to timeUpdate (utils.c:173-198)."""
    global _last_user, _last_sys, _last_rss, _last_wall
    file = file or log_file
    ru = resource.getrusage(resource.RUSAGE_SELF)
    wall = time.time()
    print(f"user\t{ru.ru_utime - _last_user:.6f}\tsystem\t{ru.ru_stime - _last_sys:.6f}"
          f"\twall\t{wall - _last_wall:.3f}"
          f"\tmax_RSS\t{ru.ru_maxrss - _last_rss}", file=file)
    file.flush()
    _last_user, _last_sys = ru.ru_utime, ru.ru_stime
    _last_rss = ru.ru_maxrss
    _last_wall = wall


def fopen_tag(root: str, tag: str, mode: str):
    """fopenTag (utils.c:80-90): open root.tag."""
    return open(f"{root}.{tag}", mode)


def c_f(v: float, prec: int = 4) -> str:
    """printf("%.Nf") rendering incl. the glibc "-nan" for 0/0 results."""
    import math
    if math.isnan(v):
        return "-nan"
    return f"{v:.{prec}f}"
