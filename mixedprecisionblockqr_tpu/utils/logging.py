"""Benchmark/metrics logging.

CSV schema parity with the reference's ``h_write_results_to_log``
(``Cuda/qr.cu:58-83``): append ``rows,cols,runtime,flops,error`` to
``log/<name>.txt`` with a header written on create.  Unlike the reference —
which logs both the fp32 and mixed GPU paths to the same ``gpu_block`` file
(``Cuda/qr.cu:1844,1898``) and scales error by 1e8 at some call sites — each
configuration here gets its own file and errors are logged unscaled.  A JSONL
sink carries richer structured records for post-processing.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict

CSV_HEADER = "rows,cols,runtime,flops,error"


class ResultsLogger:
    def __init__(self, log_dir: str = "log"):
        self.log_dir = log_dir

    def _path(self, name: str, ext: str) -> str:
        os.makedirs(self.log_dir, exist_ok=True)
        return os.path.join(self.log_dir, f"{name}.{ext}")

    def write_csv(
        self, name: str, rows: int, cols: int, runtime_s: float, flops: float,
        error: float,
    ) -> None:
        """Append one CSV record (schema of ``Cuda/qr.cu:58-83``; runtime in
        seconds, error unscaled)."""
        path = self._path(name, "txt")
        fresh = not os.path.exists(path)
        with open(path, "a") as f:
            if fresh:
                f.write(CSV_HEADER + "\n")
            f.write(f"{rows},{cols},{runtime_s},{flops},{error}\n")

    def write_jsonl(self, name: str, record: Dict[str, Any]) -> None:
        record = dict(record)
        record.setdefault("ts", time.time())
        with open(self._path(name, "jsonl"), "a") as f:
            f.write(json.dumps(record) + "\n")


def read_csv_log(path: str):
    """Parse a results CSV into a list of dicts (plot-script input,
    parity with ``Cuda/performance/util.py:6-32``)."""
    out = []
    with open(path) as f:
        header = f.readline().strip().split(",")
        for line in f:
            parts = line.strip().split(",")
            if len(parts) != len(header):
                continue
            rec = dict(zip(header, parts))
            out.append(
                {
                    "rows": int(float(rec["rows"])),
                    "cols": int(float(rec["cols"])),
                    "runtime": float(rec["runtime"]),
                    "flops": float(rec["flops"]),
                    "error": float(rec["error"]),
                }
            )
    return out


def average_by_rows(records):
    """Average repeated runs per row count — parity with the reference's
    plotting pre-pass (``Cuda/performance/util.py:6-20``)."""
    groups: Dict[int, list] = {}
    for r in records:
        groups.setdefault(r["rows"], []).append(r)
    out = []
    for rows in sorted(groups):
        grp = groups[rows]
        n = len(grp)
        out.append(
            {
                "rows": rows,
                "cols": grp[-1]["cols"],
                "runtime": sum(g["runtime"] for g in grp) / n,
                "flops": sum(g["flops"] for g in grp) / n,
                "error": sum(g["error"] for g in grp) / n,
            }
        )
    return out
