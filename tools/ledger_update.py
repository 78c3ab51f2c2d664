"""Append newly registered queries to registry_ledger.json.

The rotation breaks never-driver-checked ties by first-registered age
(workloads/registry.py:_first_registered); every register() call needs
a ledger entry or tests/test_workloads.py fails. After adding queries
in round N, run:

    python tools/ledger_update.py N

Existing entries are never modified (first-registered is immutable).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    if len(sys.argv) != 2 or not sys.argv[1].isdigit():
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])

    from st_bigdata_consume_batch_ma_with_cr_ecd_spark.workloads.registry import REGISTRY

    path = (
        Path(__file__).resolve().parent.parent
        / "st_bigdata_consume_batch_ma_with_cr_ecd_spark/workloads/registry_ledger.json"
    )
    ledger = json.loads(path.read_text())
    added = [n for n in REGISTRY if n not in ledger]
    for n in added:
        ledger[n] = rnd
    stale = sorted(set(ledger) - set(REGISTRY))
    for n in stale:
        del ledger[n]  # unregistered names fail the completeness test
    path.write_text(json.dumps(dict(sorted(ledger.items())), indent=1) + "\n")
    print(f"added {len(added)} (round {rnd}), removed {len(stale)} stale")
    for n in added:
        print(f"  + {n}")
    return 0


if __name__ == "__main__":
    main()
