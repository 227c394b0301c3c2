#!/usr/bin/env python
"""Build the --py-files zip for spark-submit (north_rule: "ships via
spark-submit --py-files"). Usage:

    python scripts/build_pyfiles.py [dist/html_sanitizer_spark.zip]
    spark-submit --py-files dist/html_sanitizer_spark.zip \
        $(python -c 'import html_sanitizer_spark.pipeline.cli as m; print(m.__file__)') \
        --input ... --output ...
"""

from __future__ import annotations

import pathlib
import sys
import zipfile

REPO = pathlib.Path(__file__).resolve().parents[1]


def build(dest: str) -> str:
    dest_path = pathlib.Path(dest)
    dest_path.parent.mkdir(parents=True, exist_ok=True)
    pkg = REPO / "html_sanitizer_spark"
    with zipfile.ZipFile(dest_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg.rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    return str(dest_path)


if __name__ == "__main__":
    out = build(sys.argv[1] if len(sys.argv) > 1 else "dist/html_sanitizer_spark.zip")
    print(out)
