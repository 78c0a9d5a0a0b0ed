"""Package jassv2_spark for `spark-submit --py-files`.

Produces a single zip of the library (sources only, no tests) that
executors can import, exactly as a cluster deployment ships it:

    python tools/package_pyfiles.py            # -> dist/jassv2_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/jassv2_spark.zip tools/submit_job.py --sf-dir ...
"""

from __future__ import annotations

import os
import zipfile


def make_zip(out: str = "dist/jassv2_spark.zip") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = out if os.path.isabs(out) else os.path.join(root, out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(root, "jassv2_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    return out


if __name__ == "__main__":
    import sys

    print(make_zip(sys.argv[1] if len(sys.argv) > 1 else "dist/jassv2_spark.zip"))
