"""Build the --py-files artifact for cluster submission.

Produces ``dist/jesse_spark.zip`` containing the pure-Python package
(the engine has no compiled components; pyspark/pyarrow/pandas/numpy
come from the cluster image), importable directly from the zip by the
executors::

    python tools/make_pyfiles.py
    spark-submit --py-files dist/jesse_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        your_job.py

``your_job.py`` then does ``from jesse_spark import validate`` as
usual; the CLI equivalently ships as
``spark-submit --py-files dist/jesse_spark.zip -m jesse_spark.cli``.
Tested in tests/test_paths_report_cli.py (zipimport smoke).
"""

from __future__ import annotations

import pathlib
import sys
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent


def build(out: pathlib.Path | None = None) -> pathlib.Path:
    out = out or REPO / "dist" / "jesse_spark.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    pkg = REPO / "jesse_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(pkg.rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    return out


if __name__ == "__main__":
    path = build(pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else None)
    print(path)
