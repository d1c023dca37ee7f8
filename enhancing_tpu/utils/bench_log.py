"""Machine-readable extended-bench artifact.

Every bench script appends JSON lines here (metric, dims, value, unit) so
the README's measured tables are regenerable and diffable round-over-round
— the driver's ``bench.py`` emits only the single headline line; this file
carries the rest (flagship rows, training breakdown, decode bandwidth,
serving). One JSON object per line, newest runs appended.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any

ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "BENCH_EXTENDED.json")


def record(metric: str, value: float, unit: str, **dims: Any) -> None:
    """Append one measurement row; ``dims`` carry the workload shape
    (batch, layers, dtype, ...). Never raises — benches should not die on a
    read-only checkout."""
    row = {"metric": metric, "value": round(float(value), 4), "unit": unit,
           "ts": int(time.time()), **dims}
    try:
        with open(ARTIFACT, "a") as f:
            f.write(json.dumps(row, sort_keys=True) + "\n")
    except OSError:
        pass
