"""Logger setup — the ``VLogger`` equivalent (console + timestamped file).

Mirrors the reference's spdlog setup (``VR/Core/Private/Logger.cpp:26-34``,
``VR/Engine/Private/Engine.cpp:132-145``): console sink plus a per-run file
``Logs/RendererLog_<datetime>.txt``.
"""

from __future__ import annotations

import datetime
import logging
import os
from typing import Optional

_LOGGER: Optional[logging.Logger] = None


def get_logger(log_dir: Optional[str] = None) -> logging.Logger:
    global _LOGGER
    if _LOGGER is not None:
        return _LOGGER
    logger = logging.getLogger("vrt")
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("[%(asctime)s] [%(levelname)s] %(message)s",
                            "%H:%M:%S")
    ch = logging.StreamHandler()
    ch.setFormatter(fmt)
    logger.addHandler(ch)
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        fh = logging.FileHandler(
            os.path.join(log_dir, f"RendererLog_{stamp}.txt"))
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    _LOGGER = logger
    return logger
