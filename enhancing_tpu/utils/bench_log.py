"""Machine-readable extended-bench artifact.

Every bench script appends JSON lines here (metric, dims, value, unit) so
the README's measured tables are regenerable and diffable round-over-round
— the driver's ``bench.py`` emits only the single headline line; this file
carries the rest (flagship rows, training breakdown, decode bandwidth,
serving). One JSON object per line, newest runs appended.
"""
from __future__ import annotations

import json
import math
import os
import time
from typing import Any

ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "BENCH_EXTENDED.json")


def record(metric: str, value: float, unit: str, **dims: Any) -> None:
    """Append one measurement row; ``dims`` carry the workload shape
    (batch, layers, dtype, ...).

    Every quantity this artifact holds is physical (a time, a rate, a
    count, a size): non-finite or negative numbers are measurement garbage
    (a noise-dominated 2n-n subtraction once archived -2.9 us / -1067 GB/s
    rows) and raise instead of being persisted. IO errors stay silent —
    benches should not die on a read-only checkout."""
    def check(name: str, v: Any) -> None:
        if isinstance(v, (list, tuple)):
            for i, e in enumerate(v):
                check(f"{name}[{i}]", e)
            return
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            return
        if not math.isfinite(v) or v < 0:
            raise ValueError(
                f"bench_log.record({metric!r}): {name}={v!r} is not a "
                "finite non-negative number — refusing to archive a "
                "physically impossible measurement (scale the timed run "
                "until the signal clears the noise floor).")

    check("value", float(value))
    for k, v in dims.items():
        check(k, v)
    row = {"metric": metric, "value": round(float(value), 4), "unit": unit,
           "ts": int(time.time()), **dims}
    try:
        with open(ARTIFACT, "a") as f:
            f.write(json.dumps(row, sort_keys=True) + "\n")
    except OSError:
        pass
