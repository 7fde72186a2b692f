"""Training-history logger with reference-compatible artifacts.

Reproduces the reference Logger (main.py:89-169):

* in-memory history of per-step batch losses and per-epoch
  (avg_loss, recall, ndcg);
* ``save(total_epochs)`` writes ``<name>_epoch_history.csv`` with the
  exact schema ``epoch,avg_loss,recall,ndcg`` (main.py:119-127) and a
  2-panel matplotlib PNG: log-scale loss with per-epoch markers at
  ``epoch * avg_steps_per_epoch``, plus recall/NDCG curves
  (main.py:130-168).

Quirk fixed (SURVEY.md §7): the reference's ``save`` reads a module-global
``config`` for the top-k labels (main.py:156-157); here ``top_k`` is a
constructor argument.  Added: throughput counters (examples/sec) — the
north-star metric has no reference counterpart.
"""

from __future__ import annotations

import os
from typing import List


class Logger:
    def __init__(self, results_dir: str, model_name: str, top_k: int = 20):
        self.results_dir = results_dir
        self.model_name = model_name
        self.top_k = top_k
        os.makedirs(self.results_dir, exist_ok=True)
        self.history = {
            "step": [],
            "batch_loss": [],
            "epoch": [],
            "epoch_avg_loss": [],
            "recall": [],
            "ndcg": [],
        }
        self.throughput: List[float] = []  # examples/sec per epoch
        self.current_step = 0

    def set_start_step(self, step: int) -> None:
        """Prime the global step counter when resuming a run, so the
        per-epoch loss markers (positioned at step/total_epochs in save())
        and the per-batch curve line up with the true global step instead
        of restarting at 0."""
        self.current_step = int(step)

    def log_batch_loss(self, loss: float) -> None:
        self.history["step"].append(self.current_step)
        self.history["batch_loss"].append(float(loss))
        self.current_step += 1

    def log_epoch_metrics(self, epoch: int, avg_loss: float, recall: float, ndcg: float) -> None:
        self.history["epoch"].append(int(epoch))
        self.history["epoch_avg_loss"].append(float(avg_loss))
        self.history["recall"].append(float(recall))
        self.history["ndcg"].append(float(ndcg))
        print(f"Logger: Epoch {epoch} metrics logged.")

    def log_throughput(self, examples_per_sec: float) -> None:
        self.throughput.append(float(examples_per_sec))

    def save(self, total_epochs: int) -> None:
        if not self.history["epoch"]:
            print("Logger: No epoch data to save.")
            return
        import pandas as pd

        df = pd.DataFrame(
            {
                "epoch": self.history["epoch"],
                "avg_loss": self.history["epoch_avg_loss"],
                "recall": self.history["recall"],
                "ndcg": self.history["ndcg"],
            }
        )
        csv_path = os.path.join(self.results_dir, f"{self.model_name}_epoch_history.csv")
        df.to_csv(csv_path, index=False)
        print(f"Epoch-level history saved to '{csv_path}'")

        if self.throughput:
            # separate file: the epoch-history schema must stay byte-
            # compatible with the reference (epoch,avg_loss,recall,ndcg)
            tp_path = os.path.join(
                self.results_dir, f"{self.model_name}_throughput.csv"
            )
            pd.DataFrame(
                {
                    "epoch": range(1, len(self.throughput) + 1),
                    "examples_per_sec": self.throughput,
                }
            ).to_csv(tp_path, index=False)

        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:  # plotting is best-effort
            return

        fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(12, 12))
        fig.suptitle(f"Training History for {self.model_name}", fontsize=16)

        if self.history["step"]:
            ax1.plot(
                self.history["step"],
                self.history["batch_loss"],
                "b-",
                alpha=0.3,
                label="Per-Batch Training Loss",
            )
        if self.history["epoch_avg_loss"] and self.current_step:
            avg_steps_per_epoch = self.current_step / total_epochs
            epoch_steps = [e * avg_steps_per_epoch for e in self.history["epoch"]]
            ax1.plot(
                epoch_steps,
                self.history["epoch_avg_loss"],
                "r-o",
                markersize=8,
                label="Per-Epoch Average Loss",
            )
        ax1.set_title("Training Loss")
        ax1.set_xlabel("Training Step")
        ax1.set_ylabel("Loss")
        ax1.grid(True)
        ax1.legend()
        ax1.set_yscale("log")

        ax2.plot(
            self.history["epoch"], self.history["recall"], "r-s",
            label=f"Recall@{self.top_k}",
        )
        ax2.plot(
            self.history["epoch"], self.history["ndcg"], "g-^",
            label=f"NDCG@{self.top_k}",
        )
        ax2.set_title("Evaluation Metrics per Epoch")
        ax2.set_xlabel("Epoch")
        ax2.set_ylabel("Metric Value")
        ax2.grid(True)
        ax2.legend()

        plt.tight_layout(rect=[0, 0.03, 1, 0.95])
        img_path = os.path.join(
            self.results_dir, f"{self.model_name}_training_curves.png"
        )
        plt.savefig(img_path)
        print(f"Training curves plot saved to '{img_path}'")
        plt.close(fig)
