"""Logging / observability.

Reproduces the reference's observability surface: the stage-1 CSV loss log
(``ldiffusion.py:127-136,284-287``), nnUNet-style dict-of-lists epoch logger
with EMA pseudo-dice and a rendered ``progress.png``
(``model/nnunetv2/training/logging/nnunet_logger.py:9-103``), and timestamped
text logging (``nnUNetTrainer.py:164-169,432-458``). Adds ``jax.profiler``
trace hooks (the reference has none — SURVEY §5 tracing)."""
from __future__ import annotations

import contextlib
import csv
import json
import os
import time
from typing import Dict, List, Optional



def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


class CSVLogger:
    """epoch,loss CSV identical in shape to the reference's contrast_loss.csv."""

    def __init__(self, path: str, header=("epoch", "loss")):
        self.path = path
        if is_main_process():
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            with open(path, "w", newline="") as f:
                csv.writer(f).writerow(list(header))

    def append(self, *row):
        if is_main_process():
            with open(self.path, "a", newline="") as f:
                csv.writer(f).writerow(list(row))


class TextLogger:
    """Timestamped text log file + stdout (rank 0 only)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        if path and is_main_process():
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def __call__(self, *msg, also_print: bool = True):
        if not is_main_process():
            return
        line = " ".join(str(m) for m in msg)
        stamped = f"{time.strftime('%Y-%m-%d %H:%M:%S')}: {line}"
        if also_print:
            print(line, flush=True)
        if self.path:
            with open(self.path, "a") as f:
                f.write(stamped + "\n")


class EpochLogger:
    """dict-of-lists per-epoch metrics with EMA pseudo-dice (β=0.9) and a
    ``progress.png`` renderer (reference ``nnunet_logger.py:9-103``)."""

    def __init__(self, ema_beta: float = 0.9):
        self.ema_beta = ema_beta
        self.data: Dict[str, List[float]] = {}

    def log(self, key: str, value: float, epoch: int):
        series = self.data.setdefault(key, [])
        while len(series) <= epoch:
            series.append(float("nan"))
        series[epoch] = float(value)
        if key == "mean_fg_dice":
            ema = self.data.setdefault("ema_fg_dice", [])
            prev = ema[epoch - 1] if epoch > 0 and len(ema) >= epoch else value
            while len(ema) <= epoch:
                ema.append(float("nan"))
            ema[epoch] = self.ema_beta * prev + (1 - self.ema_beta) * float(value)

    def get(self, key: str, epoch: int = -1) -> float:
        return self.data.get(key, [float("nan")])[epoch]

    def state_dict(self) -> dict:
        return {"data": self.data, "ema_beta": self.ema_beta}

    def load_state_dict(self, sd: dict):
        self.data = {k: list(v) for k, v in sd["data"].items()}
        self.ema_beta = sd.get("ema_beta", 0.9)

    def plot_progress(self, out_path: str):
        """Render loss/dice + epoch-time + lr panels like the reference's
        progress.png (``nnunet_logger.py:54-97``). No-op if matplotlib is
        unavailable."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        fig, axes = plt.subplots(3, 1, figsize=(10, 12))
        ax = axes[0]
        for key in ("train_loss", "val_loss"):
            if key in self.data:
                ax.plot(self.data[key], label=key)
        ax2 = ax.twinx()
        for key, style in (("mean_fg_dice", ":"), ("ema_fg_dice", "-")):
            if key in self.data:
                ax2.plot(self.data[key], style, color="g", label=key)
        ax.legend(loc="upper left")
        ax.set_xlabel("epoch")
        if "epoch_time" in self.data:
            axes[1].plot(self.data["epoch_time"])
            axes[1].set_ylabel("epoch time (s)")
        if "lr" in self.data:
            axes[2].plot(self.data["lr"])
            axes[2].set_ylabel("lr")
        fig.tight_layout()
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        fig.savefig(out_path)
        plt.close(fig)


def dump_debug_json(path: str, extra: Optional[dict] = None):
    """Environment dump analogous to nnUNet's debug.json
    (``nnUNetTrainer.py:231-264``)."""
    import jax

    info = {
        "jax_version": jax.__version__,
        "backend": jax.default_backend(),
        "device_count": jax.device_count(),
        "process_count": jax.process_count(),
        "devices": [str(d) for d in jax.devices()],
    }
    if extra:
        info.update(extra)
    if is_main_process():
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(info, f, indent=2, default=str)


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace context (SURVEY §5: tracing hook the reference
    lacks). Enabled when log_dir is set."""
    import jax

    if log_dir:
        jax.profiler.start_trace(log_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    else:
        yield
