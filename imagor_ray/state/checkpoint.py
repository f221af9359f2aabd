"""Checkpoint for the micro-batch streaming driver: watermark, processed
micro-batches, and open-session carry-over state.

Ray Data is a batch engine; event-time progress lives in the driver loop
(SURVEY §7.4.2). The checkpoint is a JSON file written with atomic rename
so a killed run resumes from the last committed micro-batch; open
sessions (conversations whose last turn is within the session gap of the
watermark) are persisted as a small parquet side-file and re-injected as
a dataset at the next cycle.
"""

from __future__ import annotations

import json
import os

import pandas as pd

__all__ = ["Checkpoint"]


class Checkpoint:
    def __init__(self, path: str):
        self.path = path
        self.state_file = os.path.join(path, "checkpoint.json")
        self.open_sessions_file = os.path.join(path, "open_sessions.parquet")
        os.makedirs(path, exist_ok=True)

    def load(self) -> dict:
        if not os.path.exists(self.state_file):
            return {"watermark_us": 0, "processed": [], "late_rows": 0, "cycles": 0}
        with open(self.state_file) as f:
            return json.load(f)

    def save(self, state: dict) -> None:
        tmp = self.state_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.state_file)

    def load_open_sessions(self) -> pd.DataFrame | None:
        if not os.path.exists(self.open_sessions_file):
            return None
        return pd.read_parquet(self.open_sessions_file)

    def save_open_sessions(self, df: pd.DataFrame) -> None:
        tmp = self.open_sessions_file + ".tmp"
        df.to_parquet(tmp, index=False)
        os.replace(tmp, self.open_sessions_file)
