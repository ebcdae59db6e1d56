"""Append-only training metrics log (text-format parity with
src/checkpoint_utils/MetricsLogger.py:21-71: config header on epoch 0,
scientific notation for *ber* keys, best-BER tracking)."""

from __future__ import annotations

import os
from datetime import datetime
from typing import Any, Optional


class MetricsLogger:
    def __init__(self, log_dir: str = "checkpoints", filename: str = "training_metrics.txt"):
        self.log_dir = log_dir
        self.log_file = os.path.join(log_dir, filename)
        os.makedirs(log_dir, exist_ok=True)
        self.best_ber = float("inf")

    def log(
        self,
        epoch: int,
        metrics: dict[str, float],
        checkpoint_filename: str,
        config: Optional[dict[str, Any]] = None,
    ):
        if epoch == 0 and config is not None:
            with open(self.log_file, "w") as f:
                f.write(f"# Training started: {datetime.now().strftime('%Y-%m-%d %H:%M:%S')}\n")
                f.write(f"# Config: {', '.join(f'{k}={v}' for k, v in config.items())}\n")
                f.write(f"# Columns: Epoch, Timestamp, {', '.join(metrics.keys())}, Checkpoint_File\n")
                f.write("-" * 120 + "\n")
        with open(self.log_file, "a") as f:
            ts = datetime.now().strftime("%Y-%m-%d %H:%M:%S")
            cells = [
                f"{v:.6e}" if "ber" in k.lower() else f"{v:.6f}" for k, v in metrics.items()
            ]
            f.write(f"{epoch:4d}, {ts}, " + ", ".join(cells) + f", {checkpoint_filename}\n")

    def is_best(self, ber: float) -> bool:
        if ber < self.best_ber:
            self.best_ber = ber
            return True
        return False
