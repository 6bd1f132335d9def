"""Regenerate the driver-verified-green set from CORRECTNESS_r*.json.

The driver's correctness gate only checks the first 50 registry entries
(see queries/__init__.py), so the registry orders not-yet-verified
queries first and the union of green rows grows round over round.  At
the START of each round, run:

    python tools/update_green_set.py CORRECTNESS_r01.json CORRECTNESS_r02.json ...

and paste the emitted set into ``_DRIVER_GREEN_R01`` (rename per round)
in ``tlcn_oer_lakehouse_spark/queries/__init__.py``.  A query is green
iff hash_match is true in ANY round (code unchanged since — changed
queries should be removed from the set manually so they re-verify).
"""

from __future__ import annotations

import json
import sys
import textwrap


def main() -> None:
    green: set[str] = set()
    for path in sys.argv[1:]:
        with open(path) as f:
            for name, row in json.load(f).items():
                if row.get("hash_match") is True:
                    green.add(name)
    body = ", ".join(f'"{n}"' for n in sorted(green))
    print(f"# {len(green)} driver-verified-green queries")
    print(
        textwrap.fill(
            body, width=76, initial_indent="    ", subsequent_indent="    "
        )
    )


if __name__ == "__main__":
    main()
