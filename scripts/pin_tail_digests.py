"""Regenerate the pinned digests for driver-window TAIL queries.

Run after any deliberate tail edit or end-of-round rotation:
    python scripts/pin_tail_digests.py

Rationale (round-4 ADVICE): tail queries sit outside the external
driver's 50-query value-check window on the premise that they are
unchanged since their last green driver row. This pin makes the premise
enforceable — `tests/test_operators.py::test_tail_queries_unchanged`
fails if a tail query's plan source or oracle SQL drifts from the digest
recorded here, forcing the edited query back into the window (or a
conscious re-pin alongside the full-catalog sweep artifact).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_harvesting_spark.plans import catalog  # noqa: E402

OUT = Path(catalog.__file__).parent / "tail_digests.json"


def main() -> None:
    digests = catalog.tail_digests()
    OUT.write_text(json.dumps(digests, indent=1, sort_keys=True) + "\n")
    print(f"pinned {len(digests)} tail digests -> {OUT}")


if __name__ == "__main__":
    main()
