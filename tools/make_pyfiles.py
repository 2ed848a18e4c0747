"""Build the --py-files zip for spark-submit (kneaddata_spark package only).

    python tools/make_pyfiles.py [out.zip]   # default /tmp/kneaddata_spark.zip
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str = "/tmp/kneaddata_spark.zip") -> str:
    pkg = os.path.join(REPO, "kneaddata_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/kneaddata_spark.zip"))
