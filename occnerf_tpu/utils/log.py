"""Logging: stdout tee to {logdir}/logs.txt (reference `core/utils/log_util.py`).

Differences from the reference: the interactive "wipe logdir?" prompt only
appears on a TTY; headless runs append instead of blocking on stdin.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

from ..config import cfg


class Logger:
    def __init__(self, wipe_existing: bool | None = None):
        log_dir = cfg.logdir
        if not cfg.resume and os.path.exists(log_dir):
            if wipe_existing is None and sys.stdin.isatty():
                ans = input(f'log dir "{log_dir}" exists.\nRemove? (y/n):')
                wipe_existing = ans.strip().lower() == "y"
            if wipe_existing:
                for entry in os.listdir(log_dir):
                    p = os.path.join(log_dir, entry)
                    shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)

        os.makedirs(log_dir, exist_ok=True)
        path = os.path.join(log_dir, "logs.txt")
        self.log = open(path, "a" if os.path.exists(path) else "w")
        self.stdout = sys.stdout
        sys.stdout = self

    def write(self, message: str) -> None:
        self.stdout.write(message)
        self.stdout.flush()
        self.log.write(message)
        self.log.flush()

    def flush(self) -> None:
        pass

    def close(self) -> None:
        sys.stdout = self.stdout
        self.log.close()

    def print_config(self) -> None:
        print("\n\n######################### CONFIG #########################\n")
        print(cfg)
        print("\n##########################################################\n\n")


class Timer:
    """Wall-clock stopwatch (reference `core/utils/train_util.py:32-42`)."""

    def __init__(self):
        self.curr_time = time.time()

    def begin(self) -> None:
        self.curr_time = time.time()

    def log(self) -> str:
        diff = time.time() - self.curr_time
        self.begin()
        return f"{diff:.2f} sec"
