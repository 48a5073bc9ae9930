"""Build the starbelly_spark zip for ``spark-submit --py-files``.

Usage: python tools/make_pyfiles.py [out.zip]   (default
/tmp/starbelly_spark.zip).  Same layout as the zip
``session._ship_package`` builds on the fly for local sessions.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    pkg_dir = os.path.join(REPO, "starbelly_spark")
    with zipfile.ZipFile(out, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/starbelly_spark.zip"
    print(build(out))
