"""Structured logging (round 4, ≙ `Lumen/src/Lumen/Log.h:1-44` — the
reference's spdlog core/client logger pair with LMN_* macros).

Two named loggers mirror the reference split:
  core   — engine/framework internals (renderer, accel, kernels)
  client — application-level messages (CLI, user scripts)

`frame_record()` emits one structured record per frame (stats dict ->
key=value line, or JSON when LUMEN_LOG_JSON=1) at DEBUG level so production
runs can tail frame telemetry without parsing prints.
"""
from __future__ import annotations

import json
import logging
import os
import sys
from typing import Dict

_FMT = "%(asctime)s [%(name)s] %(levelname)s: %(message)s"
_configured = False


def _configure():
    global _configured
    if _configured:
        return
    level = os.environ.get("LUMEN_LOG_LEVEL", "INFO").upper()
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(_FMT, datefmt="%H:%M:%S"))
    for name in ("lumen.core", "lumen.client"):
        lg = logging.getLogger(name)
        if not lg.handlers:
            lg.addHandler(handler)
        lg.setLevel(level)
        lg.propagate = False
    _configured = True


def core() -> logging.Logger:
    """Engine logger (≙ Log::GetCoreLogger / LMN_CORE_* macros)."""
    _configure()
    return logging.getLogger("lumen.core")


def client() -> logging.Logger:
    """Application logger (≙ Log::GetClientLogger / LMN_* macros)."""
    _configure()
    return logging.getLogger("lumen.client")


def frame_record(stats: Dict[str, float], logger: logging.Logger = None,
                 level: int = logging.DEBUG) -> None:
    """Emit one structured per-frame record from a FrameStats-style dict."""
    lg = logger or core()
    if os.environ.get("LUMEN_LOG_JSON") == "1":
        lg.log(level, json.dumps({"frame_stats": stats}))
    else:
        body = " ".join(
            f"{k.replace(' ', '_')}={v:.3f}" if isinstance(v, float)
            else f"{k.replace(' ', '_')}={v}"
            for k, v in stats.items()
        )
        lg.log(level, "frame %s", body)
