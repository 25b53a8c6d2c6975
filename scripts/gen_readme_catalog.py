#!/usr/bin/env python
"""Rewrite README.md's generated catalog block from the @query registry.

Usage: python scripts/gen_readme_catalog.py [--check]
--check exits 1 (without writing) if the checked-in block is stale.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from datafusion_randgen_spark.catalog_doc import replace_block  # noqa: E402


def main() -> int:
    readme = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "README.md"
    )
    with open(readme) as fh:
        cur = fh.read()
    new = replace_block(cur)
    if "--check" in sys.argv[1:]:
        if new != cur:
            print("README catalog block is stale; run "
                  "python scripts/gen_readme_catalog.py", file=sys.stderr)
            return 1
        print("README catalog block is current")
        return 0
    if new != cur:
        with open(readme, "w") as fh:
            fh.write(new)
        print("README.md catalog block regenerated")
    else:
        print("README.md already current")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
