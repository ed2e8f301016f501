"""Structured run logging (the reference's ``logging_utils`` is an empty
placeholder; this one is real — JSONL event logs + console summaries,
composing with the result dataclasses that carry the actual observability,
SURVEY.md §5.5)."""

from __future__ import annotations

import json
import logging
import sys
import time
from typing import Any, Dict, Optional


def get_logger(name: str = "gpmpc_tpu", level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        logger.addHandler(h)
        logger.setLevel(level)
    return logger


class RunLogger:
    """JSONL event log for campaigns/learning runs."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._fh = open(path, "a") if path else None
        self._t0 = time.time()

    def log(self, event: str, **fields: Any) -> None:
        rec: Dict[str, Any] = {"t": round(time.time() - self._t0, 3), "event": event}
        for k, v in fields.items():
            try:
                json.dumps(v)
                rec[k] = v
            except TypeError:
                rec[k] = str(v)
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        else:
            print(line)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
