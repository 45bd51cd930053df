"""Package frontier_engine for spark-submit --py-files.

    python tools/make_pyfiles.py [out.zip]     # default dist/frontier_engine.zip

The zip contains only the package's .py files (no caches, no tests) — the
artifact the north rule ships to a cluster:

    spark-submit --master ... --py-files dist/frontier_engine.zip \
        jobs/crawl.py --pages ... --seeds ... --robots ... --warehouse ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "frontier_engine.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "frontier_engine")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                z.write(full, rel)
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
