"""Experiment-directory manager — behavioral port of reference
``utils/saver.py`` (run/<dataset>/<checkname>/experiment_N layout), minus the
torch checkpoint dependency (state is saved as npz)."""

from __future__ import annotations

import glob
import os
from collections import OrderedDict

import numpy as np


class Saver:
    def __init__(self, train_dataset: str, checkname: str, root: str = "run"):
        self.directory = os.path.join(root, train_dataset, checkname)
        runs = sorted(glob.glob(os.path.join(self.directory, "experiment_*")),
                      key=lambda p: int(p.split("_")[-1]))
        run_id = int(runs[-1].split("_")[-1]) + 1 if runs else 0
        self.experiment_dir = os.path.join(self.directory,
                                           f"experiment_{run_id}")
        os.makedirs(self.experiment_dir, exist_ok=True)

    def save_checkpoint(self, state: dict, filename: str = "checkpoint.npz"):
        np.savez(os.path.join(self.experiment_dir, filename), **state)

    def save_experiment_config(self, params: dict):
        with open(os.path.join(self.experiment_dir, "parameters.txt"), "w") as f:
            for k, v in OrderedDict(params).items():
                f.write(f"{k}:{v}\n")
