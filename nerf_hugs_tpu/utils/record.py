"""Run logging: stdout + persistent `run_log.log` in the checkpoint dir.

Reference observability parity: nerfacto's Recorder writes every printed
message through a logging.FileHandler alongside the TensorBoard writer
(nerfacto/utils/record_utils.py:5-23). Our TB writers live in the drivers;
this module carries the logfile twin. Multi-host: only host 0 opens the
file (enable_file=False elsewhere) — the same discipline as host-0-only TB.
"""

from __future__ import annotations

import logging
import os


class Recorder:
    """print() twin that also appends to {folder}/run_log.log."""

    def __init__(self, folder: str, enable_file: bool = True):
        self.logger = None
        self._handler = None
        if enable_file:
            os.makedirs(folder, exist_ok=True)
            # Per-instance logger (unique name) so two stages/drivers in one
            # process don't double-append through a shared logger.
            self.logger = logging.getLogger(
                f"nerf_hugs_tpu.run_log.{id(self)}")
            self.logger.setLevel(logging.INFO)
            self.logger.propagate = False
            self._handler = logging.FileHandler(
                os.path.join(folder, "run_log.log"))
            self._handler.setLevel(logging.INFO)
            self._handler.setFormatter(logging.Formatter(
                "%(asctime)s - %(levelname)s # %(message)s"))
            self.logger.addHandler(self._handler)

    def print(self, message: str):
        print(message, flush=True)
        if self.logger is not None:
            self.logger.info(message)

    def close(self):
        if self._handler is not None:
            self.logger.removeHandler(self._handler)
            self._handler.close()
            self._handler = None
